package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class BloomJoinSpec extends SparkSpec {
  import SparkSpec.spark.implicits._

  // vals, not defs: each toDF mints fresh attribute ids, and the join
  // conditions below reference columns of THESE instances
  private lazy val probe = (1L to 5000L).map(i => (i, s"p$i")).toDF("k", "pv")
  private lazy val build = (1L to 5000L by 97L).map(i => (i, s"b$i"))
    .toDF("bk", "bv")

  test("prefiltered join result == plain join result (composition law)") {
    val plain = probe.join(build, probe("k") === build("bk"))
      .select("k", "pv", "bv").collect().toSet
    val pre = BloomJoin.join(probe, "k", build, "bk")
      .select("k", "pv", "bv").collect().toSet
    assert(pre == plain)
    assert(plain.nonEmpty)
  }

  test("no false negatives: every build key survives the prefilter") {
    val kept = BloomJoin.prefilter(probe, "k", build, "bk")
      .select("k").as[Long].collect().toSet
    val keys = build.select("bk").as[Long].collect().toSet
    assert(keys.subsetOf(kept))
  }

  test("prefilter is selective at low fpp (actually drops non-matches)") {
    val kept = BloomJoin.prefilter(probe, "k", build, "bk", fpp = 0.01)
      .count()
    // 52 true matches out of 5000; 1% fpp leaves ~50 false positives
    assert(kept < 500, s"prefilter kept $kept of 5000 rows")
  }

  test("string keys hash consistently across both sides") {
    val p = Seq("a", "b", "c", "d").toDF("k")
    val b = Seq("b", "d").toDF("bk")
    val pre = BloomJoin.join(p, "k", b, "bk").select("k").as[String]
      .collect().toSet
    assert(pre == Set("b", "d"))
  }

  test("filter artifact is reusable across queries (PQ-codebook pattern)") {
    val bytes = BloomJoin.keyFilter(build, "bk")
    val q1 = probe.filter(BloomJoin.mightMatch(bytes, col("k"))).count()
    val q2 = probe.filter(BloomJoin.mightMatch(bytes, col("k")))
      .filter($"k" > 2500).count()
    assert(q1 >= 52 && q2 >= 26 && q2 < q1)
  }
}
