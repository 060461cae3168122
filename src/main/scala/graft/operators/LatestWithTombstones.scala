package graft.operators

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

import graft.core.StreamElement

/** Single-pass snapshot compaction: a typed Aggregator holding, per
  * (key, wildcard-prefix) group, the newest wildcard tombstone position and
  * the latest element per concrete attribute — the "latest-wins with
  * tombstones" aggregate SURVEY §4 flags as the one genuinely custom
  * aggregate (plain `max_by` cannot encode wildcard-delete semantics).
  *
  * Compared to [[SnapshotCompact.snapshot]] (two aggregations + a join),
  * this runs ONE shuffle: Spark lifts the Aggregator into partial
  * (map-side) + final aggregation, so the shuffle carries one combined
  * buffer per (key, prefix) instead of raw elements — at 100 TB that is the
  * difference between shuffling events and shuffling live state.
  *
  * Associativity of `merge`: the combined tombstone is the max of both
  * positions, and filtering both sides' survivors by that max commutes —
  * property-tested against the two-pass implementation and the in-memory
  * model in SnapshotLaws.
  */
object LatestWithTombstones {

  /** (stamp, seqId, uuid) ordering position, flattened for encoding. */
  final case class Acc(
      hasWc: Boolean, wcStamp: Long, wcSeq: Long, wcUuid: String,
      latest: Map[String, StreamElement])

  private val posOrd = StreamElement.positionOrdering
  private def pos(e: StreamElement): (Long, Long, String) = e.position

  /** `retainTombstones = false` is the classic snapshot (tombstones
    * resolved then DROPPED). `true` keeps the newest tombstone per cell —
    * exact deletes and the covering wildcard tombstone itself — in the
    * output, making compaction an UNCONDITIONAL semigroup:
    * `compactRetaining(compactRetaining(A) ∪ B) == compactRetaining(A ∪ B)`
    * for ANY split, late data included (no compact-to-watermark
    * precondition — the retained tombstone is exactly the information
    * whose loss creates [[IncrementalSnapshot]]'s counterexample). This
    * is the Kafka-log-compaction / Cassandra-gc-grace model; pair with
    * a separate tombstone-expiry pass once lateness is bounded.
    */
  final class Agg(retainTombstones: Boolean = false)
      extends Aggregator[StreamElement, Acc, Seq[StreamElement]] {
    def zero: Acc = Acc(hasWc = false, Long.MinValue, Long.MinValue, "", Map.empty)

    private def wcPos(a: Acc) = (a.wcStamp, a.wcSeq, a.wcUuid)

    private def applyWc(a: Acc, p: (Long, Long, String)): Acc =
      if (a.hasWc && posOrd.gteq(wcPos(a), p)) a
      else Acc(hasWc = true, p._1, p._2, p._3,
        a.latest.filter { case (_, e) => posOrd.gt(pos(e), p) })

    def reduce(a: Acc, e: StreamElement): Acc =
      if (e.deleteWildcard) {
        // the covering tombstone is itself retained as the latest element
        // of its `prefix.*` attribute (harmless in classic mode: finish
        // filters deletes), so a retained compaction round-trips it
        val b = applyWc(a, pos(e))
        if (b.latest.get(e.attribute).exists(c => posOrd.gteq(pos(c), pos(e)))) b
        else b.copy(latest = b.latest.updated(e.attribute, e))
      } else {
        val covered = a.hasWc && posOrd.lteq(pos(e), wcPos(a))
        val stale = a.latest.get(e.attribute).exists(c => posOrd.gteq(pos(c), pos(e)))
        if (covered || stale) a
        else a.copy(latest = a.latest.updated(e.attribute, e))
      }

    def merge(x: Acc, y: Acc): Acc = {
      // combined tombstone = max of both (applyWc keeps the newer and
      // filters x's survivors by it); then fold y's survivors through
      // reduce, which re-checks them against the combined tombstone
      val base = if (y.hasWc) applyWc(x, wcPos(y)) else x
      y.latest.values.foldLeft(base)(reduce)
    }

    def finish(a: Acc): Seq[StreamElement] =
      if (retainTombstones) a.latest.values.toSeq
      // isDelete, not delete: the retained wildcard tombstone entry may
      // carry deleteWildcard=true with delete=false (the case class
      // permits it even though the factory sets both) and must never
      // surface as a live row
      else a.latest.values.filterNot(_.isDelete).toSeq

    def bufferEncoder: Encoder[Acc] = Encoders.product[Acc]
    def outputEncoder: Encoder[Seq[StreamElement]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[StreamElement]]()
  }

  private def compactWith(ds: Dataset[StreamElement], asOf: Long,
      retain: Boolean): Dataset[StreamElement] = {
    implicit val se = StreamElement.encoder
    implicit val ke = Encoders.tuple(Encoders.STRING, Encoders.STRING)
    val bounded = if (asOf == Long.MaxValue) ds else ds.filter(_.stamp <= asOf)
    bounded
      .groupByKey(e => (e.key, e.attributePrefix))
      .agg(new Agg(retain).toColumn.name("snap"))
      .flatMap(_._2)
  }

  /** One-shuffle snapshot (same contract as SnapshotCompact.snapshot). */
  def snapshot(ds: Dataset[StreamElement], asOf: Long = Long.MaxValue): Dataset[StreamElement] =
    compactWith(ds, asOf, retain = false)

  /** Tombstone-RETAINING compaction: latest element per cell including
    * deletes and the newest wildcard tombstone per prefix. Idempotent and
    * unconditionally incremental (see [[Agg]]); `snapshot` = this
    * filtered to non-deletes. The live-read filter is `!delete`;
    * tombstones are garbage only once lateness is bounded — expire them
    * with a stamp-horizon filter, after which elements older than the
    * horizon may resurrect (the documented log-compaction contract).
    */
  def compactRetaining(ds: Dataset[StreamElement]): Dataset[StreamElement] =
    compactWith(ds, Long.MaxValue, retain = true)
}
