package graft.operators

import graft.SparkSpec
import graft.SparkSpec.spark.implicits._

/** Range join: grain-bucketed lowering must equal the naive inequality
  * join exactly (including intervals spanning multiple grains and
  * boundary instants), with an equi-join plan.
  */
class RangeJoinSpec extends SparkSpec {

  private val left = Seq(
    ("a", 5L, "l1"), ("a", 10L, "l2"), ("a", 19L, "l3"), ("a", 20L, "l4"),
    ("a", 35L, "l5"), ("b", 10L, "l6"))
    .toDF("k", "ts", "lid")
  private val right = Seq(
    ("a", 10L, 20L, "r1"),   // one grain (grain=10): [10,20)
    ("a", 5L, 36L, "r2"),    // spans four grains
    ("b", 0L, 10L, "r3"),    // excludes ts=10 (end exclusive)
    ("c", 0L, 100L, "r4"))
    .toDF("k", "start", "end", "rid")

  private def pairs(grain: Long): Set[(String, String)] =
    RangeJoin.join(left, right, "k", "ts", "start", "end", grain)
      .select($"lid", $"rid").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet

  test("equals the naive inequality join at any grain") {
    val naive = left.as("l").join(right.as("r"),
        $"l.k" === $"r.k" && $"l.ts" >= $"r.start" && $"l.ts" < $"r.end")
      .select($"lid", $"rid").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(naive == Set(("l2", "r1"), ("l3", "r1"), ("l1", "r2"),
      ("l2", "r2"), ("l3", "r2"), ("l4", "r2"), ("l5", "r2")))
    assert(pairs(10) == naive)
    assert(pairs(3) == naive)
    assert(pairs(1000) == naive)
  }

  test("bucketing is exact past 2^53 (double floor would mis-bucket)") {
    // raw-nano scale instants: 2^53 + small offsets; double arithmetic
    // rounds these to the same value and drops/invents matches
    val base = (1L << 53)
    val l = Seq(("a", base + 1L, "l1"), ("a", base + 3L, "l2"))
      .toDF("k", "ts", "lid")
    val r = Seq(("a", base + 2L, base + 4L, "r1")).toDF("k", "start", "end", "rid")
    val got = RangeJoin.join(l, r, "k", "ts", "start", "end", 2L)
      .select($"lid", $"rid").collect().map(x => (x.getString(0), x.getString(1))).toSet
    assert(got == Set(("l2", "r1")))
  }

  test("corrupt end <= start intervals match nothing instead of exploding") {
    val r = Seq(("a", 100L, -1000000000L, "bad"), ("a", 10L, 20L, "ok"))
      .toDF("k", "start", "end", "rid")
    val got = RangeJoin.join(left, r, "k", "ts", "start", "end", 10)
      .select($"lid", $"rid").collect().map(x => (x.getString(0), x.getString(1))).toSet
    assert(got == Set(("l2", "ok"), ("l3", "ok")))
  }

  test("plan is an equi-join, not a nested loop") {
    val plan = RangeJoin.join(left, right, "k", "ts", "start", "end", 10)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
  }
}
