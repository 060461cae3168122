package graft.operators

import graft.SparkSpec
import graft.SparkSpec.spark.implicits._

/** AS-OF join semantics: latest at-or-before per key, same-instant
  * inclusion, deterministic tie resolution, null for no-match — and the
  * plan guarantee that makes it usable at scale (no range-join blowup).
  */
class AsOfJoinSpec extends SparkSpec {

  private val left = Seq(
    ("a", 10L, "e1"), ("a", 20L, "e2"), ("a", 5L, "e3"), ("b", 10L, "e4"))
    .toDF("k", "ts", "eid")
  private val right = Seq(
    ("a", 10L, "x", 1L), ("a", 10L, "y", 2L), ("a", 15L, "z", 3L),
    ("c", 1L, "other-key", 4L))
    .toDF("k", "ts", "v", "rid")

  test("latest at-or-before, same-instant ties, and no-match nulls") {
    val out = AsOfJoin.join(left, right, "k", "ts",
        valueCols = Seq("v"), tiebreak = "rid")
      .collect().map(r => r.getString(2) -> Option(r.getString(3))).toMap
    assert(out("e1") == Some("y"), "same-instant: included, highest tiebreak wins")
    assert(out("e2") == Some("z"), "latest value at-or-before ts=20")
    assert(out("e3") == None, "nothing at-or-before ts=5")
    assert(out("e4") == None, "no right rows for key b")
  }

  test("reserved column names and non-numeric tiebreaks are rejected") {
    val clashing = left.withColumnRenamed("eid", "asof_v")
    val e1 = intercept[IllegalArgumentException] {
      AsOfJoin.join(clashing, right, "k", "ts", Seq("v"), "rid")
    }
    assert(e1.getMessage.contains("asof_v"))
    val e2 = intercept[IllegalArgumentException] {
      AsOfJoin.join(left, right, "k", "ts", Seq("rid"), tiebreak = "v")
    }
    assert(e2.getMessage.contains("must be numeric"))
  }

  test("plan is one shuffle, never a cartesian or nested-loop range join") {
    val plan = AsOfJoin.join(left, right, "k", "ts", Seq("v"), "rid")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(plan.contains("Window"), plan)
  }

  test("bucketed variant equals the plain join on a hot-key history") {
    // one hot key with a dense interleaved history spanning many grains
    // (incl. same-instant ties and a null value to exercise carry-in),
    // plus a sparse key whose buckets are mostly right-less
    val rnd = new scala.util.Random(42)
    val hotL = (1 to 2000).map(i => ("hot", rnd.nextInt(500).toLong, s"e$i"))
    val hotR = (1 to 600).map(i => ("hot", rnd.nextInt(500).toLong,
      if (i % 37 == 0) null else s"v$i", i.toLong))
    val sparse = Seq(("cold", 490L, "ec1"), ("cold", 3L, "ec2"))
    val sparseR = Seq(("cold", 2L, "cv", 9001L))
    val l = (hotL ++ sparse).toDF("k", "ts", "eid")
    val r = (hotR ++ sparseR).toDF("k", "ts", "v", "rid")
    def key(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(x => (x.getString(2), Option(x.getString(3)))).toSet
    val plain = key(AsOfJoin.join(l, r, "k", "ts", Seq("v"), "rid"))
    for (grain <- Seq(7L, 50L, 1000L))
      assert(key(AsOfJoin.joinBucketed(l, r, "k", "ts", Seq("v"), "rid", grain))
        == plain, s"grain $grain diverged")
  }

  test("bucketed variant partitions the big window by (key, bucket)") {
    val plan = AsOfJoin.joinBucketed(left, right, "k", "ts", Seq("v"), "rid", 10L)
      .queryExecution.executedPlan.toString
    // the |L|+|R| window must NOT partition by key alone: its
    // partition spec carries the bucket column, so a hot key spreads
    assert(plan.contains("_b"), plan)
    val windowSpecs = plan.linesIterator.filter(_.contains("windowspecdefinition")).toSeq
    assert(windowSpecs.exists(s => s.contains("_b") && s.contains("_side")),
      s"in-bucket window must partition by (k, _b):\n$plan")
  }
}
