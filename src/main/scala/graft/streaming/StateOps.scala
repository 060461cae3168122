package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.core.StreamElement

/** Streaming keyed-state operators over the StreamElement changelog —
  * the Structured Streaming lowerings of the reference's stateful surface
  * (reference: direct/core/.../view/LocalCachedPartitionedView.java:59 for
  * the compacted view; BeamStream.java:1498 IntegrateDoFn, :1544
  * AbstractReduceValueStateByKey for the keyed state machines).
  *
  * State is keyed by (entity key, attribute prefix) so one state cell owns a
  * whole wildcard relation — exactly what wildcard-delete tombstones need
  * (StreamElement.java:145): the tombstone position is kept alongside the
  * per-suffix winners, and any later upsert resurrects only suffixes written
  * after it. At scale the state store shards on the group key; per-cell
  * payload is bounded by a key's live suffixes (same bound as the
  * reference's TimeBoundedVersionedCache).
  */
object StateOps {

  /** Ordering position of an element (stamp, seqId, uuid) — ties resolved
    * exactly like SnapshotCompact.
    */
  private def pos(e: StreamElement): (Long, Long, String) =
    (e.stamp, e.seqId, e.uuid)

  private val posOrd = implicitly[Ordering[(Long, Long, String)]]

  /** Per-prefix snapshot state: newest wildcard tombstone position and the
    * latest element per concrete attribute.
    */
  final case class PrefixState(
      wcStamp: Long, wcSeq: Long, wcUuid: String, hasWc: Boolean,
      latest: Map[String, StreamElement])

  /** Continuously-maintained snapshot: emits the new winner per (key,
    * attribute) whenever it changes — an upsert changelog of the compacted
    * view, with tombstones emitted as deletes so a downstream cache can
    * evict. Works on both batch and streaming Datasets; on streaming this
    * is the CachedView maintenance query.
    */
  def snapshotUpdates(stream: Dataset[StreamElement]): Dataset[StreamElement] = {
    implicit val se = StreamElement.encoder
    implicit val ste = Encoders.product[PrefixState]
    implicit val ke = Encoders.tuple(Encoders.STRING, Encoders.STRING)
    stream
      .groupByKey(e => (e.key, e.attributePrefix))
      .flatMapGroupsWithState[PrefixState, StreamElement](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        case (_, elems, state: GroupState[PrefixState]) =>
          var st = state.getOption.getOrElse(
            PrefixState(Long.MinValue, Long.MinValue, "", hasWc = false, Map.empty))
          val changed = collection.mutable.LinkedHashMap.empty[String, StreamElement]
          def wcPos = (st.wcStamp, st.wcSeq, st.wcUuid)
          elems.foreach { e =>
            if (e.deleteWildcard) {
              if (!st.hasWc || posOrd.gt(pos(e), wcPos)) {
                // evict every live suffix at-or-before the tombstone
                val (dead, alive) = st.latest.partition { case (_, v) =>
                  posOrd.lteq(pos(v), pos(e))
                }
                dead.foreach { case (a, v) =>
                  changed(a) = v.copy(value = null, delete = true)
                }
                st = PrefixState(e.stamp, e.seqId, e.uuid, hasWc = true, alive)
              }
            } else {
              val cur = st.latest.get(e.attribute)
              val coveredByWc = st.hasWc && posOrd.lteq(pos(e), wcPos)
              if (!coveredByWc && cur.forall(c => posOrd.lt(pos(c), pos(e)))) {
                st = st.copy(latest = st.latest.updated(e.attribute, e))
                changed(e.attribute) = e
              }
            }
          }
          state.update(st)
          changed.values.iterator
      }
  }

  /** Streaming integratePerKey: running combine per key across batches,
    * elements sorted by event time WITHIN each batch (the reference's
    * @RequiresTimeSortedInput relaxed to per-batch order + watermark
    * discipline, BeamStream.java:1498).
    */
  def integratePerKey(stream: Dataset[StreamElement], initial: Double,
      valueOf: StreamElement => Double,
      combine: (Double, Double) => Double): Dataset[(String, Long, Double)] = {
    implicit val oe = Encoders.tuple(Encoders.STRING, Encoders.scalaLong,
      Encoders.scalaDouble)
    implicit val ste = Encoders.scalaDouble
    implicit val ke = Encoders.STRING
    stream
      .groupByKey(_.key)
      .flatMapGroupsWithState[Double, (String, Long, Double)](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        case (key, elems, state: GroupState[Double]) =>
          var acc = state.getOption.getOrElse(initial)
          val out = elems.toSeq.sortBy(e => (e.stamp, e.seqId)).map { e =>
            acc = combine(acc, valueOf(e))
            (key, e.stamp, acc)
          }
          state.update(acc)
          out.iterator
      }
  }

  /** Streaming reduceValueStateByKey: general keyed state machine, per-batch
    * event-time-sorted (Stream.java:386).
    */
  def reduceValueStateByKey[S: org.apache.spark.sql.Encoder, O](
      stream: Dataset[StreamElement], initialState: S,
      output: (S, StreamElement) => O, update: (S, StreamElement) => S)(
      implicit oe: org.apache.spark.sql.Encoder[(String, O)]): Dataset[(String, O)] = {
    implicit val ke = Encoders.STRING
    stream
      .groupByKey(_.key)
      .flatMapGroupsWithState[S, (String, O)](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        case (key, elems, state: GroupState[S]) =>
          var st = state.getOption.getOrElse(initialState)
          val out = elems.toSeq.sortBy(e => (e.stamp, e.seqId)).map { e =>
            val o = output(st, e)
            st = update(st, e)
            (key, o)
          }
          state.update(st)
          out.iterator
      }
  }
}
