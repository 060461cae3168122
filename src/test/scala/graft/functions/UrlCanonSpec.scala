package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** URL canonicalization rules on hand URLs + the dedup law. */
class UrlCanonSpec extends SparkSpec {
  import SparkSpec.spark.implicits._

  private def canon(urls: String*): Seq[String] = {
    val df = urls.zipWithIndex.map { case (u, i) => (i.toLong, u) }
      .toDF("id", "url")
    df.select(UrlCanon.canonicalize(col("url")).as("c"))
      .as[String].collect().toSeq
  }

  test("scheme/host lowercase, path case preserved") {
    assert(canon("HTTP://WWW.Example.COM/A/B") ==
      Seq("http://www.example.com/A/B"))
  }

  test("default ports drop, explicit ports stay") {
    assert(canon(
      "http://a.com:80/x", "https://a.com:443/x",
      "http://a.com:8080/x", "https://a.com:80/x") == Seq(
      "http://a.com/x", "https://a.com/x",
      "http://a.com:8080/x", "https://a.com:80/x"))
  }

  test("fragment dropped, empty path becomes /") {
    assert(canon("http://a.com#frag", "http://a.com/x#y") ==
      Seq("http://a.com/", "http://a.com/x"))
  }

  test("utm params stripped, remaining params byte-sorted") {
    assert(canon(
      "http://a.com/x?utm_source=f&b=2&a=1",
      "http://a.com/x?a=1&b=2",
      "http://a.com/x?utm_campaign=c&utm_medium=m") == Seq(
      "http://a.com/x?a=1&b=2",
      "http://a.com/x?a=1&b=2",
      "http://a.com/x"))
  }

  test("canonicalization is idempotent over a structured URL space") {
    // 384 seeded combinations of case, port, params (incl. utm and
    // unsorted), fragments — canon(canon(u)) must equal canon(u), the
    // law that makes re-processing already-clean crawl data safe
    val rng = new scala.util.Random(42)
    val urls = (1 to 384).map { i =>
      val scheme = if (i % 2 == 0) "http" else "HTTPS"
      val host = if (i % 3 == 0) s"WWW.Host$i.COM" else s"host$i.org"
      val port = i % 4 match {
        case 0 => ":80"
        case 1 => ":443"
        case 2 => s":${8000 + rng.nextInt(100)}"
        case _ => ""
      }
      val path = if (i % 5 == 0) "" else s"/P${rng.nextInt(10)}/x"
      val q = i % 6 match {
        case 0 => "?utm_source=a&z=9&a=1"
        case 1 => "?b=2&a=1"
        case 2 => "?utm_campaign=c"
        case _ => ""
      }
      val frag = if (i % 7 == 0) "#sec" else ""
      (i.toLong, s"$scheme://$host$port$path$q$frag")
    }
    val df = urls.toDF("id", "url")
      .select(UrlCanon.canonicalize(col("url")).as("c1"))
      .select(col("c1"), UrlCanon.canonicalize(col("c1")).as("c2"))
    assert(df.filter(col("c1") =!= col("c2")).count() == 0,
      df.filter(col("c1") =!= col("c2")).take(3).mkString("; "))
  }

  test("dedup assigns the smallest id per canonical form") {
    val df = Seq(
      (5L, "HTTP://A.com/x?b=2&a=1#f"),
      (2L, "http://a.com:80/x?a=1&b=2"),
      (9L, "http://a.com/y")).toDF("doc_id", "url")
    val out = UrlCanon.dedup(df, "doc_id", "url")
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2)))
      .toMap
    assert(out(5L) == ("http://a.com/x?a=1&b=2", 2L))
    assert(out(2L) == ("http://a.com/x?a=1&b=2", 2L))
    assert(out(9L) == ("http://a.com/y", 9L))
  }
}
