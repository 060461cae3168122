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
}
