package graft.functions

import graft.SparkSpec

/** Boilerplate detection/strip laws: dominant prefix stripped exactly,
  * share threshold respected, sources without a banner untouched, short
  * docs never candidates, deterministic tie-break.
  */
class BoilerplateSpec extends SparkSpec {
  import SparkSpec.spark.implicits._

  private val banner = "ad banner"
  // source a: 3 of 4 docs carry the 2-token banner; source b: organic
  private def corpus = Seq(
    (1L, "a", s"$banner alpha beta gamma"),
    (2L, "a", s"$banner delta epsilon"),
    (3L, "a", s"$banner zeta"),
    (4L, "a", "clean doc here"),
    (5L, "b", "one two three"),
    (6L, "b", "four five six")
  ).toDF("doc_id", "source", "text")

  private def run(minBp: Int = 5000) = Boilerplate
    .stripCommonPrefix(corpus, "doc_id", "source", "text", k = 2, minBp)
    .collect()
    .map(r => r.getLong(0) -> (r.getBoolean(2), r.getLong(3), r.getString(4)))
    .toMap

  test("dominant banner stripped exactly; clean docs and sources intact") {
    val out = run()
    assert(out(1L) == (true, 3L, "alpha beta gamma"))
    assert(out(2L) == (true, 2L, "delta epsilon"))
    assert(out(3L) == (true, 1L, "zeta"))
    assert(out(4L) == (false, 3L, "clean doc here"))
    // source b has no ≥50% prefix: "one two" and "four five" are 1/2
    // each — count ties break to the smaller prefix, but 1/2 meets a
    // 50% bar, so b DOES get a verdict: "four five" (lexicographic)
    assert(out(5L) == (false, 3L, "one two three"))
    assert(out(6L) == (true, 1L, "six"))
  }

  test("a higher share bar rejects the tie verdict but keeps the banner") {
    val out = run(minBp = 7000)
    assert(out(1L)._1 && out(2L)._1 && out(3L)._1, "75% banner survives")
    assert(!out(5L)._1 && !out(6L)._1, "50% organic tie must not pass 70%")
  }

  test("docs shorter than k are never candidates nor stripped") {
    val tiny = Seq((1L, "a", "solo"), (2L, "a", "x y z"), (3L, "a", "x y w"))
      .toDF("doc_id", "source", "text")
    val out = Boilerplate.stripCommonPrefix(tiny, "doc_id", "source",
        "text", k = 2, minShareBp = 5000)
      .collect().map(r => r.getLong(0) -> (r.getBoolean(2), r.getString(4)))
      .toMap
    // "x y" covers 2 of 3 docs (the short doc still counts in the total)
    assert(out(1L) == (false, "solo"))
    assert(out(2L) == (true, "z"))
    assert(out(3L) == (true, "w"))
  }

  test("input validation") {
    intercept[IllegalArgumentException] {
      Boilerplate.stripCommonPrefix(corpus, "doc_id", "source", "text", 0)
    }
    intercept[IllegalArgumentException] {
      Boilerplate.stripCommonPrefix(corpus, "doc_id", "source", "text", 2, 0)
    }
  }
}
