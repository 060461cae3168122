package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Guard rail for bucket-collect pair generation (LSH bands, shingle
  * inverted indexes, simhash pigeonhole bands): a degenerate corpus — N
  * identical boilerplate documents — collapses into ONE bucket whose
  * in-task pair emission is O(N²). At 100 TB that is a single straggler
  * task holding the whole cluster.
  *
  * `prune` drops buckets above a size cap BEFORE any per-bucket list is
  * materialized: a count pre-aggregation (map-side combinable, shuffle of
  * one row per bucket) followed by a semi join. Dropping is semantically
  * honest for near-dup candidate generation — a bucket of thousands of
  * members is a boilerplate cluster, not a near-duplicate *pair* candidate
  * set — and every drop is logged with its size so callers can route
  * oversized clusters to a dedicated exact-dedup pass instead.
  *
  * Uncapped (`maxBucket == Int.MaxValue`) the function is a no-op, keeping
  * the default single-shuffle plan.
  */
object BucketedPairs {

  @transient private lazy val log =
    org.slf4j.LoggerFactory.getLogger(getClass)

  /** Remove all rows belonging to buckets (grouped by `keyCols`) with more
    * than `maxBucket` members. Logs the number and max size of dropped
    * buckets (an extra small job over the aggregated counts — only in
    * capped mode).
    */
  def prune(df: DataFrame, keyCols: Seq[String], maxBucket: Int): DataFrame =
    if (maxBucket == Int.MaxValue) df
    else {
      val keys = keyCols.map(col)
      val counts = df.groupBy(keys: _*).agg(count(lit(1)).as("_n"))
      val over = counts.filter(col("_n") > maxBucket)
        .agg(count(lit(1)).as("buckets"), max(col("_n")).as("largest"))
        .head()
      if (over.getLong(0) > 0)
        log.warn(s"BucketedPairs: dropping ${over.getLong(0)} bucket(s) " +
          s"over cap $maxBucket (largest: ${over.getLong(1)} members)")
      df.join(counts.filter(col("_n") <= maxBucket).select(keys: _*),
        keyCols, "left_semi")
    }
}
