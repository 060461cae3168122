package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Guard rail for bucket-collect pair generation (LSH bands, shingle
  * inverted indexes, simhash pigeonhole bands): a degenerate corpus — N
  * identical boilerplate documents — collapses into ONE bucket whose
  * in-task pair emission is O(N²). At 100 TB that is a single straggler
  * task holding the whole cluster.
  *
  * [[split]] divides the input into rows of buckets at-or-under the cap
  * (`kept`) and one row per oversized bucket (`dropped`, with its member
  * count) — BOTH lazily composed DataFrames; no Spark job runs until an
  * action, so the guard is usable inside streaming plans and interactive
  * composition. Dropping is semantically honest for near-dup CANDIDATE
  * generation — a bucket of thousands of members is a boilerplate cluster,
  * not a near-duplicate pair candidate set — and the `dropped` side output
  * lets a pipeline route those clusters to a dedicated exact-dedup pass
  * instead of losing them to a log line.
  *
  * Uncapped (`maxBucket == Int.MaxValue`) the plan is untouched and
  * `dropped` is statically empty.
  */
object BucketedPairs {

  /** Default per-bucket cap for pipeline entry points: generous enough
    * that genuine near-dup clusters pass untouched, small enough that one
    * boilerplate bucket (cap² / 2 ≈ 2M in-task pairs) stays a bounded task
    * instead of an unkillable straggler.
    */
  val DefaultMaxBucket: Int = 2048

  /** `kept`: input rows in buckets with <= maxBucket members.
    * `dropped`: one row per oversized bucket — its key columns plus
    * `members` — for quarantine routing.
    */
  final case class Split(kept: DataFrame, dropped: DataFrame)

  /** Lazily split `df` (bucketed by `keyCols`) at the cap. One count
    * pre-aggregation (map-side combinable, one row per bucket) feeds both
    * sides: a semi join keeps small-bucket rows, the over-cap counts ARE
    * the dropped side output.
    */
  def split(df: DataFrame, keyCols: Seq[String], maxBucket: Int): Split = {
    val keys = keyCols.map(col)
    val counts = df.groupBy(keys: _*).agg(count(lit(1)).as("members"))
    if (maxBucket == Int.MaxValue)
      Split(df, counts.filter(lit(false)))
    else {
      // consuming the quarantine side also feeds the metrics surface
      // (graft.core.Metrics.install harvests observe() fields) — counted
      // where the drops are materialized, no extra job
      val dropped = graft.core.Metrics.observed(
        counts.filter(col("members") > maxBucket),
        Seq(count(lit(1)).as("graft.buckets.dropped"),
          coalesce(sum(col("members")), lit(0L)).as("graft.buckets.droppedMembers")))
      Split(
        df.join(counts.filter(col("members") <= maxBucket).select(keys: _*),
          keyCols, "left_semi"),
        dropped)
    }
  }

  /** Keep only rows of buckets at-or-under the cap (discard the drop side
    * output). A no-op when uncapped.
    */
  def prune(df: DataFrame, keyCols: Seq[String], maxBucket: Int): DataFrame =
    if (maxBucket == Int.MaxValue) df else split(df, keyCols, maxBucket).kept
}
