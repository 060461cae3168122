package graft.streaming

import scala.concurrent.duration.FiniteDuration

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.functions.{col, timestamp_micros, timestamp_millis}
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
  *
  * Every operator takes an optional `cleanup` duration — the reference's
  * cleanup timers (RetractJoin.java:57-140 timer-based eviction,
  * TimeBoundedVersionedCache time bound), which are EVENT-TIME timers in
  * the reference (Beam `TimeDomain.EVENT_TIME`). When set, a cell whose
  * newest element is older than (watermark − cleanup) is evicted on an
  * `EventTimeTimeout` and a later element rebuilds it from the initial
  * state, so unbounded key cardinality cannot grow state forever across a
  * long-running query. The operator attaches its own zero-disorder
  * watermark over the element stamp right before the stateful step —
  * Spark requires the watermark-annotated column in the state operator's
  * direct input, and any upstream annotation dies at the first
  * object-level transform (MapElements re-creates attributes without
  * metadata), so an internal attach is the only shape that always works.
  * Spark's watermark is per-micro-batch (one batch of lag — noise at
  * real cleanup horizons). When unset (bounded inputs, tests) state is
  * kept for the lifetime of the query, matching the previous behavior;
  * batch execution never fires timers, so cleanup is inert there.
  */
object StateOps {

  /** Timeout config for an optional TTL: the reference's timers are
    * event-time, and `EventTimeTimeout` is also the only timeout whose
    * `shouldRunAnotherBatch` converges (a ProcessingTimeTimeout query
    * re-batches forever, so `processAllAvailable` never returns).
    */
  private def timeoutConf(ttl: Option[FiniteDuration]): GroupStateTimeout =
    if (ttl.isDefined) GroupStateTimeout.EventTimeTimeout()
    else GroupStateTimeout.NoTimeout()

  /** The current watermark, or None where none exists (batch execution —
    * where timers never fire, so arming is correctly skipped).
    */
  private[streaming] def watermarkMs(state: GroupState[_]): Option[Long] =
    try Some(state.getCurrentWatermarkMs())
    catch { case _: UnsupportedOperationException => None }

  /** Millis per stamp unit — the divisor that puts element stamps on the
    * watermark's millisecond clock.
    */
  private[streaming] def stampDivisor(stampUnit: String): Long = stampUnit match {
    case "micros" => 1000L
    case "millis" => 1L
    case u => throw new IllegalArgumentException(
      s"stampUnit must be micros|millis, got '$u'")
  }

  /** Attach a zero-disorder watermark riding the element stamp, keeping
    * the annotated column in the plan (the typed deserializer ignores the
    * extra column, so downstream object code is unaffected). Zero
    * disorder is correct here: the stateful operators order per batch and
    * compare stamps themselves, so a late element is still APPLIED — the
    * watermark only drives timers, and the cleanup horizon is documented
    * to exceed the source's max disorder.
    */
  private[streaming] def withStampWatermark[T](ds: Dataset[T], stampCol: String,
      stampUnit: String)(implicit enc: Encoder[T]): Dataset[T] = {
    val ts = stampUnit match {
      case "micros" => timestamp_micros(col(stampCol))
      case "millis" => timestamp_millis(col(stampCol))
      case u => throw new IllegalArgumentException(
        s"stampUnit must be micros|millis, got '$u'")
    }
    ds.withColumn("__graft_event_time", ts)
      .withWatermark("__graft_event_time", "0 milliseconds").as[T]
  }

  /** Arm the state timer: at the cleanup/early-emit deadline measured
    * from the cell's last event time, but never at-or-before the current
    * watermark (Spark rejects that) — a deadline already behind the
    * watermark fires on the next batch boundary instead.
    */
  private[streaming] def armAfter(state: GroupState[_], wm: Long,
      deadlineMs: Long): Unit =
    state.setTimeoutTimestamp(math.max(deadlineMs, wm + 1))

  /** Ordering position of an element (stamp, seqId, uuid) — ties resolved
    * exactly like SnapshotCompact.
    */
  private def pos(e: StreamElement): (Long, Long, String) =
    (e.stamp, e.seqId, e.uuid)

  private val posOrd = implicitly[Ordering[(Long, Long, String)]]

  /** Per-prefix snapshot state: newest wildcard tombstone position and the
    * latest element per concrete attribute. `lastEventMs` = the cell's
    * newest element stamp on the millisecond clock — the idle clock the
    * cleanup timer measures against (eviction when watermark − lastEventMs
    * ≥ cleanup, the reference's per-key horizon).
    */
  final case class PrefixState(
      wcStamp: Long, wcSeq: Long, wcUuid: String, hasWc: Boolean,
      latest: Map[String, StreamElement], lastEventMs: Long)

  /** Continuously-maintained snapshot: emits the new winner per (key,
    * attribute) whenever it changes — an upsert changelog of the compacted
    * view, with tombstones emitted as deletes so a downstream cache can
    * evict. Works on both batch and streaming Datasets; on streaming this
    * is the CachedView maintenance query.
    */
  def snapshotUpdates(stream: Dataset[StreamElement],
      cleanup: Option[FiniteDuration] = None,
      stampUnit: String = "micros"): Dataset[StreamElement] = {
    implicit val se = StreamElement.encoder
    implicit val ste = Encoders.product[PrefixState]
    implicit val ke = Encoders.tuple(Encoders.STRING, Encoders.STRING)
    val div = stampDivisor(stampUnit)
    val src =
      if (cleanup.isDefined) withStampWatermark(stream, "stamp", stampUnit)
      else stream
    src
      .groupByKey(e => (e.key, e.attributePrefix))
      .flatMapGroupsWithState[PrefixState, StreamElement](
        OutputMode.Update(), timeoutConf(cleanup)) {
        case (_, elems, state: GroupState[PrefixState]) =>
          if (state.hasTimedOut) {
            val wm = state.getCurrentWatermarkMs()
            if (cleanup.exists(c => wm - state.get.lastEventMs >= c.toMillis)) {
              // cell's newest element is a full cleanup behind the
              // watermark: drop it. A later element rebuilds the snapshot
              // from scratch — the same trade-off as the reference's
              // TimeBoundedVersionedCache aging out a key's versions: an
              // element older than an already-evicted winner can win
              // again, which is why cleanup must exceed the source's max
              // disorder.
              state.remove()
            } else {
              // armed early (the arm was clamped past a stale watermark):
              // re-arm for the true deadline
              cleanup.foreach(c => armAfter(state, wm, state.get.lastEventMs + c.toMillis))
            }
            Iterator.empty
          } else {
            var st = state.getOption.getOrElse(
              PrefixState(Long.MinValue, Long.MinValue, "", hasWc = false,
                Map.empty, 0L))
            val changed = collection.mutable.LinkedHashMap.empty[String, StreamElement]
            def wcPos = (st.wcStamp, st.wcSeq, st.wcUuid)
            elems.foreach { e =>
              st = st.copy(lastEventMs = math.max(st.lastEventMs, e.stamp / div))
              if (e.deleteWildcard) {
                if (!st.hasWc || posOrd.gt(pos(e), wcPos)) {
                  // evict every live suffix at-or-before the tombstone
                  val (dead, alive) = st.latest.partition { case (_, v) =>
                    posOrd.lteq(pos(v), pos(e))
                  }
                  dead.foreach { case (a, v) =>
                    changed(a) = v.copy(value = null, delete = true)
                  }
                  st = PrefixState(e.stamp, e.seqId, e.uuid, hasWc = true,
                    alive, st.lastEventMs)
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
            cleanup.foreach { c =>
              watermarkMs(state).foreach(wm =>
                armAfter(state, wm, st.lastEventMs + c.toMillis))
            }
            state.update(st)
            changed.values.iterator
          }
      }
  }

  /** Streaming integratePerKey: running combine per key across batches,
    * elements sorted by event time WITHIN each batch (the reference's
    * @RequiresTimeSortedInput relaxed to per-batch order + watermark
    * discipline, BeamStream.java:1498).
    */
  def integratePerKey(stream: Dataset[StreamElement], initial: Double,
      valueOf: StreamElement => Double,
      combine: (Double, Double) => Double,
      cleanup: Option[FiniteDuration] = None,
      stampUnit: String = "micros"): Dataset[(String, Long, Double)] = {
    implicit val oe = Encoders.tuple(Encoders.STRING, Encoders.scalaLong,
      Encoders.scalaDouble)
    // state = (accumulator, last event time ms — the cleanup idle clock)
    implicit val ste = Encoders.tuple(Encoders.scalaDouble, Encoders.scalaLong)
    implicit val ke = Encoders.STRING
    val div = stampDivisor(stampUnit)
    val src =
      if (cleanup.isDefined) withStampWatermark(stream, "stamp", stampUnit)
      else stream
    src
      .groupByKey(_.key)
      .flatMapGroupsWithState[(Double, Long), (String, Long, Double)](
        OutputMode.Update(), timeoutConf(cleanup)) {
        case (key, elems, state: GroupState[(Double, Long)]) =>
          if (state.hasTimedOut) {
            val wm = state.getCurrentWatermarkMs()
            if (cleanup.exists(c => wm - state.get._2 >= c.toMillis)) {
              // newest element a full cleanup behind the watermark: evict;
              // a later element restarts from `initial`
              state.remove()
            } else {
              cleanup.foreach(c => armAfter(state, wm, state.get._2 + c.toMillis))
            }
            Iterator.empty
          } else {
            var acc = state.getOption.map(_._1).getOrElse(initial)
            var lastEventMs = state.getOption.map(_._2).getOrElse(Long.MinValue)
            val out = elems.toSeq.sortBy(e => (e.stamp, e.seqId)).map { e =>
              acc = combine(acc, valueOf(e))
              lastEventMs = math.max(lastEventMs, e.stamp / div)
              (key, e.stamp, acc)
            }
            cleanup.foreach { c =>
              watermarkMs(state).foreach(wm =>
                armAfter(state, wm, lastEventMs + c.toMillis))
            }
            state.update((acc, lastEventMs))
            out.iterator
          }
      }
  }

  /** Streaming reduceValueStateByKey: general keyed state machine, per-batch
    * event-time-sorted (Stream.java:386).
    *
    * `earlyEmit` is the reference's early-emitting timer loop
    * (BeamStream.java:1596-1622 AbstractReduceValueStateByKey onTimer,
    * an EVENT_TIME `earlyTimer`): a key that received no element while
    * the watermark advanced a full interval re-emits
    * `output(state, null)` — null element, exactly the reference's timer
    * call — and re-arms, so a quiet key keeps publishing its current fold
    * on a watermark cadence. A null OUTPUT is discarded (Stream.java:409
    * "when function returns null the output is discarded"). When both
    * `earlyEmit` and `cleanup` are set the single state timer ticks at
    * the smaller interval and the cell tracks its last-arrival watermark
    * to tell the two apart: idle ≥ cleanup wins and evicts.
    */
  def reduceValueStateByKey[S: org.apache.spark.sql.Encoder, O](
      stream: Dataset[StreamElement], initialState: S,
      output: (S, StreamElement) => O, update: (S, StreamElement) => S,
      cleanup: Option[FiniteDuration] = None,
      earlyEmit: Option[FiniteDuration] = None,
      stampUnit: String = "micros")(
      implicit oe: org.apache.spark.sql.Encoder[(String, O)]): Dataset[(String, O)] = {
    implicit val ke = Encoders.STRING
    // state envelope carries the cell's last event time (ms) for the
    // cleanup-vs-earlyEmit disambiguation; MinValue until data arrives
    implicit val envEnc: org.apache.spark.sql.Encoder[(S, Long)] =
      Encoders.tuple(implicitly[org.apache.spark.sql.Encoder[S]], Encoders.scalaLong)
    val tick: Option[FiniteDuration] = (earlyEmit, cleanup) match {
      case (Some(e), Some(c)) => Some(e.min(c))
      case (e, c)             => e.orElse(c)
    }
    val div = stampDivisor(stampUnit)
    val src =
      if (tick.isDefined) withStampWatermark(stream, "stamp", stampUnit)
      else stream
    src
      .groupByKey(_.key)
      .flatMapGroupsWithState[(S, Long), (String, O)](
        OutputMode.Update(), timeoutConf(tick)) {
        case (key, elems, state: GroupState[(S, Long)]) =>
          if (state.hasTimedOut) {
            val (st, lastEventMs) = state.get
            val wm = state.getCurrentWatermarkMs()
            if (cleanup.exists(c => wm - lastEventMs >= c.toMillis)) {
              state.remove()
              Iterator.empty
            } else {
              // not yet idle ≥ cleanup: re-arm. An early-emitting key
              // re-arms one interval from the current watermark (the
              // reference re-arms offset(earlyEmitting) relative,
              // BeamStream.java:1620) — never past the cleanup deadline;
              // a cleanup-only timer that fired off a clamped arm re-arms
              // for the remaining idle allowance.
              val nextAt = (earlyEmit, cleanup) match {
                case (Some(e), Some(c)) =>
                  math.min(wm + e.toMillis, lastEventMs + c.toMillis)
                case (Some(e), None) => wm + e.toMillis
                case (None, c)       => lastEventMs + c.get.toMillis
              }
              armAfter(state, wm, nextAt)
              if (earlyEmit.isDefined)
                Option(output(st, null)).map(o => (key, o)).iterator
              else Iterator.empty
            }
          } else {
            var st = state.getOption.map(_._1).getOrElse(initialState)
            var lastEventMs = state.getOption.map(_._2).getOrElse(Long.MinValue)
            val out = elems.toSeq.sortBy(e => (e.stamp, e.seqId)).map { e =>
              val o = output(st, e)
              st = update(st, e)
              lastEventMs = math.max(lastEventMs, e.stamp / div)
              (key, o)
            }
            tick.foreach { t =>
              watermarkMs(state).foreach(wm =>
                armAfter(state, wm, lastEventMs + t.toMillis))
            }
            state.update((st, lastEventMs))
            out.iterator
          }
      }
  }
}
