package graft.functions

import graft.SparkSpec

class Bm25Spec extends SparkSpec {

  private def docs(rows: (Long, String)*) = {
    val s = spark; import s.implicits._
    rows.toDF("doc_id", "text")
  }

  test("bm25 hand-computed score on a 3-doc corpus") {
    // corpus: N=3, dl = 3,3,3 → avgdl=3; term "cat": df=2
    val d = docs(
      1L -> "cat sat mat",
      2L -> "cat cat mat",
      3L -> "dog ate bone")
    val out = Bm25.topK(d, "doc_id", "text", Seq("cat"), k = 3).collect()
    val k1 = 1.2; val b = 0.75
    def score(tf: Double): Double = {
      val idf = math.log((3.0 - 2.0 + 0.5) / (2.0 + 0.5) + 1.0)
      idf * tf * (k1 + 1.0) / (tf + k1 * ((1.0 - b) + b * 3.0 / 3.0))
    }
    def r4(x: Double): Double =
      BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    // tf=2 beats tf=1 beats tf=0; rounded exactly like the engine
    assert(out.map(_.getLong(0)).toSeq === Seq(2L, 1L, 3L))
    assert(out(0).getDouble(1) === r4(score(2)))
    assert(out(1).getDouble(1) === r4(score(1)))
    assert(out(2).getDouble(1) === 0.0)
  }

  test("rarer term dominates at equal tf (idf contrast)") {
    // "rare" in 1 of 4 docs, "common" in 3 of 4 — doc scoring via the
    // rare term must outrank the same-shaped doc scoring via the common
    val d = docs(
      1L -> "rare x y",
      2L -> "common x y",
      3L -> "common a b",
      4L -> "common c d")
    val out =
      Bm25.topK(d, "doc_id", "text", Seq("rare", "common"), k = 4).collect()
    assert(out.head.getLong(0) === 1L)
  }

  test("top-k cut is by raw score with ascending-id tie-break") {
    val d = docs((1L to 10L).map(i => i -> "same text here"): _*)
    val out = Bm25.topK(d, "doc_id", "text", Seq("same"), k = 4).collect()
    // all scores tie → the 4 smallest ids survive
    assert(out.map(_.getLong(0)).toSeq === Seq(1L, 2L, 3L, 4L))
  }

  test("sqlDouble round-trips the exact binary64 value") {
    for (x <- Seq(1.2, 0.75, 2.2, 1.0 / 3.0, math.Pi)) {
      assert(java.lang.Double.parseDouble(Bm25.sqlDouble(x)) === x)
    }
  }
}
