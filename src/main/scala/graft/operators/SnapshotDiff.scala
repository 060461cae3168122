package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

import graft.core.StreamElement

/** Snapshot DIFF between two as-of horizons: the per-cell change set an
  * incremental consumer (training-data refresh, downstream sync, cache
  * invalidation) applies to move a materialization from `snapshot(t1)` to
  * `snapshot(t2)` — the read-side complement of
  * [[IncrementalSnapshot.merge]] (which moves the STATE forward; this
  * reports WHAT moved).
  *
  * Change classification per (key, attribute):
  *  - `added`   — live at t2, absent at t1;
  *  - `removed` — live at t1, dead at t2 (exact delete, wildcard
  *    tombstone, or superseded into nothing);
  *  - `updated` — live at both with a DIFFERENT winning element.
  * Unchanged cells do not appear.
  *
  * Scale shape: only keys carrying a delta element in (t1, t2] can
  * change — tombstones included, since every tombstone names its key —
  * so the history is semi-join-restricted to the delta's key set BEFORE
  * either compaction runs. At 100 TB with a day's delta, both compaction
  * scans and the full-outer join are O(touched keys' history), not
  * O(corpus); the semi join's build side is the delta key set (AQE
  * broadcasts a small day).
  */
object SnapshotDiff {

  def diff(ds: Dataset[StreamElement], t1: Long, t2: Long): DataFrame = {
    require(t1 < t2, s"need t1 < t2, got $t1 >= $t2")
    val touched = ds.toDF()
      .filter(col("stamp") > t1 && col("stamp") <= t2)
      .select(col("key")).distinct()
    val hist = ds.toDF().join(touched, Seq("key"), "left_semi")
      .as[StreamElement](StreamElement.encoder)

    def side(asOf: Long, tag: String): DataFrame =
      SnapshotCompact.snapshot(hist, asOf).toDF()
        .select(col("key"), col("attribute"),
          col("seqId").as(s"${tag}_event_id"),
          col("stamp").as(s"${tag}_stamp"))

    side(t1, "old")
      .join(side(t2, "new"), Seq("key", "attribute"), "full_outer")
      .withColumn("change",
        when(col("old_event_id").isNull, "added")
          .when(col("new_event_id").isNull, "removed")
          .otherwise("updated"))
      .filter(col("old_event_id").isNull || col("new_event_id").isNull ||
        col("old_event_id") =!= col("new_event_id") ||
        col("old_stamp") =!= col("new_stamp"))
      .select(col("key"), col("attribute"), col("change"),
        col("old_event_id"), col("new_event_id"))
  }
}
