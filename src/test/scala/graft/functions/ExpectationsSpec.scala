package graft.functions

import graft.SparkSpec

class ExpectationsSpec extends SparkSpec {
  import Expectations._
  import SparkSpec.spark.implicits._

  private def docs = Seq(
    (1L, "hello", "en", 5L),
    (2L, "welt", "de", 4L),
    (3L, null.asInstanceOf[String], "en", 0L),
    (4L, "mundo", "xx", 5L)
  ).toDF("id", "text", "lang", "len")

  test("clean data passes every check") {
    val r = report(docs, Seq(Unique("id"), MinCount(3),
      Complete("lang", 10000)))
    assert(r.collect().forall(_.getBoolean(3)))
  }

  test("violations measured in exact basis points") {
    val r = report(docs, Seq(
      Complete("text", 10000),                  // 3/4 = 7500 bp -> fail
      InSet("lang", Seq("en", "de"), 0),        // 1/4 = 2500 bp -> fail
      InRange("len", 1, 100, 2500)))            // 1/4 = 2500 bp -> pass
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getBoolean(3)))).toMap
    assert(r("complete(text)>=10000") == ((7500L, false)))
    assert(r("in_set(lang)<=0") == ((2500L, false)))
    assert(r("in_range(len,1,100)<=2500") == ((2500L, true)))
  }

  test("uniqueness detects a single duplicate") {
    val dup = docs.unionByName(Seq((1L, "again", "en", 5L))
      .toDF("id", "text", "lang", "len"))
    val r = report(dup, Seq(Unique("id"))).collect()(0)
    assert(!r.getBoolean(3) && r.getLong(1) < 10000L)
  }

  test("enforce throws naming the failed checks") {
    val e = intercept[IllegalStateException] {
      enforce(docs, Seq(Complete("text", 10000), MinCount(2)))
    }
    assert(e.getMessage.contains("complete(text)"))
    assert(!e.getMessage.contains("count>=2"))
  }

  test("empty input: ratios defined, min-count fails") {
    val r = report(docs.limit(0), Seq(Complete("text", 10000), MinCount(1)))
      .collect().map(r => r.getString(0) -> r.getBoolean(3)).toMap
    assert(r("complete(text)>=10000")) // vacuously complete
    assert(!r("count>=1"))
  }
}
