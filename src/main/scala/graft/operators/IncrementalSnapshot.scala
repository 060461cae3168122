package graft.operators

import org.apache.spark.sql.Dataset

import graft.core.StreamElement

/** Incremental snapshot maintenance: fold a newer changelog delta into an
  * already-compacted snapshot WITHOUT rescanning the history that produced
  * it. This is how batch-snapshot families stay fresh at scale in the
  * reference deployment model (compaction runs periodically over the bulk
  * family; reads combine the compacted part with the commit-log tail —
  * reference: direct/io-bulkfs + the batch-snapshot access pattern,
  * core/.../storage/AccessType.java:51-59).
  *
  * Scale shape: daily maintenance of a 100 TB changelog becomes
  * O(|snapshot| + |delta|) instead of O(|history|) — one
  * [[LatestWithTombstones]] shuffle over yesterday's live state plus
  * today's delta, with map-side partial aggregation collapsing both sides
  * to one buffer per (key, prefix) before the exchange. If the snapshot is
  * persisted as a key-bucketed table, the exchange on the prev side
  * disappears entirely (bucketed scan reports HashPartitioning); the
  * operator itself is agnostic to that.
  *
  * Correctness law (property-tested in SnapshotLaws):
  *
  *   pos(b) > pos(a) for all a in history, b in delta  =>
  *     merge(snapshot(history), delta) == snapshot(history ∪ delta)
  *
  * where pos = (stamp, seqId, uuid). The precondition is the
  * compact-to-watermark contract: compaction covered everything with
  * stamp <= T, the delta is everything after. It is NOT optional —
  * compaction drops delete tombstones, so a delta element positioned
  * BETWEEN a historical victim and its historical tombstone would
  * wrongly survive (see the counterexample spec). Splitting a changelog
  * by stamp satisfies it because stamp dominates the position ordering.
  */
object IncrementalSnapshot {

  /** Snapshot of (the history behind `prev`) ∪ `delta`, under the
    * compact-to-watermark precondition documented above. The result is
    * itself a valid `prev` for the next round (snapshot idempotence).
    */
  def merge(prev: Dataset[StreamElement],
      delta: Dataset[StreamElement]): Dataset[StreamElement] =
    LatestWithTombstones.snapshot(prev.unionByName(delta))

  /** [[merge]] with the precondition VERIFIED at run time against the
    * compaction watermark `watermark` (the T the caller compacted up to —
    * it must be carried alongside the snapshot, because the snapshot
    * itself cannot witness history's max stamp once tombstones are
    * dropped): throws unless every prev stamp <= watermark < every delta
    * stamp. Costs one aggregate per side — use on untrusted splits;
    * scheduled pipelines where the split IS the watermark can call
    * [[merge]] directly.
    */
  def mergeChecked(prev: Dataset[StreamElement],
      delta: Dataset[StreamElement], watermark: Long): Dataset[StreamElement] = {
    import org.apache.spark.sql.functions._
    val hi = prev.agg(max(col("stamp"))).collect()(0)
    val lo = delta.agg(min(col("stamp"))).collect()(0)
    if (!hi.isNullAt(0) && hi.getLong(0) > watermark)
      throw new IllegalArgumentException(
        s"snapshot max stamp ${hi.getLong(0)} > watermark $watermark: " +
          "prev is not a compact-to-watermark snapshot")
    if (!lo.isNullAt(0) && lo.getLong(0) <= watermark)
      throw new IllegalArgumentException(
        s"delta min stamp ${lo.getLong(0)} <= watermark $watermark: " +
          "compact-to-watermark precondition violated")
    merge(prev, delta)
  }
}
