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

  test("violation ratios are vacuously ZERO on empty / all-null columns") {
    // no non-null values = no violations: InRange/InSet must report
    // metric_bp 0 and pass, not a phantom 100% violation rate — use
    // MinCount to reject empty inputs instead
    val s = spark; import s.implicits._
    val allNull = Seq((null: String, null: java.lang.Long),
        (null: String, null: java.lang.Long))
      .toDF("lang", "len")
    for (df <- Seq(allNull, allNull.limit(0))) {
      val r = report(df, Seq(
          InRange("len", 0, 100, 0), InSet("lang", Seq("en"), 0)))
        .collect().map(x => x.getString(0) -> ((x.getLong(1), x.getBoolean(3))))
        .toMap
      assert(r("in_range(len,0,100)<=0") == ((0L, true)), r)
      assert(r("in_set(lang)<=0") == ((0L, true)), r)
    }
  }
}
