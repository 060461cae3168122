package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Extraction contract: script/style content never leaks, tags become
  * word boundaries, entity order handles encoded tags and double
  * encoding, whitespace collapses.
  */
class HtmlExtractSpec extends SparkSpec {
  import SparkSpec.spark.implicits._

  private def extract(html: String): String =
    Seq(Tuple1(html)).toDF("h")
      .select(HtmlExtract.extract(col("h")).as("t"))
      .as[String].collect()(0)

  test("script and style CONTENT is dropped, not just the tags") {
    assert(extract("a<script>var秘密=1;</script>b<style>p{}</style>c") ==
      "a b c")
    assert(extract("<script src='x'>\nmulti\nline\n</script>ok") == "ok")
  }

  test("uppercase/mixed-case script tags drop their content too") {
    assert(extract("<SCRIPT>alert(1)</SCRIPT>hi") == "hi")
    assert(extract("<Style>p{}</Style>ok") == "ok")
  }

  test("an embedded </style> cannot terminate a <script> block") {
    assert(extract("<script>a();</style>b();</script>c") == "c")
  }

  test("tags become word boundaries") {
    assert(extract("one<br>two<p class='x'>three</p>") == "one two three")
  }

  test("entity-encoded tags survive as visible text") {
    assert(extract("<p>&lt;p&gt; is a tag</p>") == "<p> is a tag")
  }

  test("double-encoded entities decode exactly one level") {
    assert(extract("&amp;lt;") == "&lt;")
    assert(extract("&amp;amp;") == "&amp;")
  }

  test("basic entities and whitespace collapse") {
    assert(extract("a&nbsp;&nbsp;b  &amp;\t c&quot;d&#39;e") ==
      "a b & c\"d'e")
  }
}
