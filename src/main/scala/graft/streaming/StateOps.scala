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
  * long-running query. The operator attaches its own watermark over the
  * element stamp, delayed by the cleanup horizon, right before the
  * stateful step — Spark requires the watermark-annotated column in the
  * state operator's direct input, and any upstream annotation dies at
  * the first object-level transform (MapElements re-creates attributes
  * without metadata), so an internal attach is the only shape that
  * always works. With cleanup set, an element arriving more than a full
  * horizon out of order is DROPPED before the operator (Spark's
  * event-time-timeout late-row filter) — the same horizon contract as
  * eviction, so one `cleanup` bounds both state size and accepted
  * disorder. Spark's watermark is per-micro-batch (one batch of lag —
  * noise at real cleanup horizons). When unset (bounded inputs, tests)
  * state is kept for the lifetime of the query and nothing is dropped,
  * matching the previous behavior; batch execution never fires timers,
  * so cleanup is inert there.
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

  /** Attach a watermark riding the element stamp, delayed by the cleanup
    * horizon, keeping the annotated column in the plan (the typed
    * deserializer ignores the extra column, so downstream object code is
    * unaffected). The delay choice is load-bearing: with
    * `EventTimeTimeout`, Spark's FlatMapGroupsWithStateExec DROPS input
    * rows older than the late-events watermark before the user function
    * sees them (applyRemovingRowsOlderThanWatermark in
    * processDataWithPartition) — delaying the watermark by the horizon
    * makes that drop land exactly on the operator's documented contract
    * (data more than `cleanup` out of order is no longer
    * applicable/retractable), instead of on whatever disorder happens to
    * straddle a micro-batch boundary. Consequence used by every caller:
    * the watermark reads as (max stamp seen − horizon), so "evict when
    * the cell is idle a full horizon" is simply `watermark ≥
    * lastEventMs`.
    */
  /** The stamp column as a TIMESTAMP — the unit whitelist lives in
    * [[stampDivisor]] alone; a new unit lands in one place or refuses
    * everywhere.
    */
  private[streaming] def stampTimestamp(stampCol: String,
      stampUnit: String): org.apache.spark.sql.Column =
    if (stampDivisor(stampUnit) == 1000L) timestamp_micros(col(stampCol))
    else timestamp_millis(col(stampCol))

  private[streaming] def withStampWatermark[T](ds: Dataset[T], stampCol: String,
      stampUnit: String, delayMs: Long)(implicit enc: Encoder[T]): Dataset[T] =
    ds.withColumn("__graft_event_time", stampTimestamp(stampCol, stampUnit))
      .withWatermark("__graft_event_time", s"$delayMs milliseconds").as[T]

  /** Arm the state timer at a deadline on the watermark clock, but never
    * at-or-before the current watermark (Spark rejects that) — a deadline
    * already behind the watermark fires on the next batch boundary
    * instead.
    */
  private[streaming] def armAfter(state: GroupState[_], wm: Long,
      deadlineMs: Long): Unit =
    state.setTimeoutTimestamp(math.max(deadlineMs, wm + 1))

  /** The shared hasTimedOut handler for horizon-delayed cleanup-only
    * cells (the watermark lags max-stamp-seen by the horizon, so wm ≥
    * lastEventMs ⟺ the cell has been idle a full cleanup in event time):
    * evict when idle, else re-arm for the true deadline (the arm may have
    * been clamped past a stale watermark). Returns true when evicted.
    */
  private[streaming] def evictOrRearm(state: GroupState[_],
      lastEventMs: Long): Boolean = {
    val wm = state.getCurrentWatermarkMs()
    if (wm >= lastEventMs) { state.remove(); true }
    else { armAfter(state, wm, lastEventMs); false }
  }

  /** Ordering position of an element (stamp, seqId, uuid) — ties resolved
    * exactly like SnapshotCompact.
    */
  private def pos(e: StreamElement): (Long, Long, String) = e.position

  private val posOrd = StreamElement.positionOrdering

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
    val src = cleanup match {
      case Some(c) => withStampWatermark(stream, "stamp", stampUnit, c.toMillis)
      case None    => stream
    }
    src
      .groupByKey(e => (e.key, e.attributePrefix))
      .flatMapGroupsWithState[PrefixState, StreamElement](
        OutputMode.Update(), timeoutConf(cleanup)) {
        case (_, elems, state: GroupState[PrefixState]) =>
          if (state.hasTimedOut) {
            // on eviction a later element rebuilds the snapshot from
            // scratch — the same trade-off as the reference's
            // TimeBoundedVersionedCache aging out a key's versions: an
            // element older than an already-evicted winner can win again
            // if it is within the horizon (anything older is
            // late-filtered before the operator)
            evictOrRearm(state, state.get.lastEventMs)
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
                  // evict every live suffix at-or-before the tombstone.
                  // The per-suffix delete is emitted AT THE TOMBSTONE'S
                  // position (uuid disambiguated per attribute so the
                  // idempotent sink's uuid anti-join keeps per-element
                  // granularity): the deletion happened at the
                  // tombstone's stamp, so a position-ordered consumer
                  // (LWW store, CachedView as-of reads between the dead
                  // upsert and the tombstone) sees the cell die at the
                  // right point — an emission reusing the dead element's
                  // own position would tie with it and be ignored or
                  // shadow it at earlier stamps.
                  val (dead, alive) = st.latest.partition { case (_, v) =>
                    posOrd.lteq(pos(v), pos(e))
                  }
                  dead.foreach { case (a, v) =>
                    changed(a) = v.copy(uuid = s"${e.uuid}#$a",
                      seqId = e.seqId, stamp = e.stamp,
                      value = null, delete = true)
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
            if (cleanup.isDefined) {
              watermarkMs(state).foreach { wm =>
                armAfter(state, wm, st.lastEventMs)
                // prune scalar tombstones nothing can contradict
                // anymore: a retained tombstone only exists to shadow a
                // LATER-ARRIVING element at-or-below its position, and
                // any such element's event time is at or below the
                // tombstone's — once the watermark passed that stamp
                // the upstream late filter drops it, so the tombstone
                // is dead weight (a hot key churning distinct suffixes
                // through write+delete would otherwise grow this map by
                // one permanent tombstone per suffix)
                val pruned = st.latest.filter { case (_, v) =>
                  !v.delete || v.stamp / div >= wm
                }
                if (pruned.size != st.latest.size)
                  st = st.copy(latest = pruned)
              }
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
    val src = cleanup match {
      case Some(c) => withStampWatermark(stream, "stamp", stampUnit, c.toMillis)
      case None    => stream
    }
    src
      .groupByKey(_.key)
      .flatMapGroupsWithState[(Double, Long), (String, Long, Double)](
        OutputMode.Update(), timeoutConf(cleanup)) {
        case (key, elems, state: GroupState[(Double, Long)]) =>
          if (state.hasTimedOut) {
            // on eviction a later element restarts from `initial`
            evictOrRearm(state, state.get._2)
            Iterator.empty
          } else {
            var acc = state.getOption.map(_._1).getOrElse(initial)
            var lastEventMs = state.getOption.map(_._2).getOrElse(Long.MinValue)
            val out = elems.toSeq.sortBy(e => (e.stamp, e.seqId)).map { e =>
              acc = combine(acc, valueOf(e))
              lastEventMs = math.max(lastEventMs, e.stamp / div)
              (key, e.stamp, acc)
            }
            if (cleanup.isDefined) {
              watermarkMs(state).foreach(wm =>
                armAfter(state, wm, lastEventMs))
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
    * "when function returns null the output is discarded"). The cell
    * tracks its last event time and its last emission time on the stamp
    * clock; the single state timer arms at the earlier of the two
    * deadlines (next emission, eviction), and the firing handler tells
    * them apart — idle ≥ cleanup wins and evicts.
    *
    * `disorder` bounds the accepted out-of-orderness independently of
    * the timer intervals. Any event-time timeout makes Spark drop rows
    * behind the late-events watermark, so the attached watermark's delay
    * is max(cleanup, disorder, earlyEmit): with cleanup set the drop
    * horizon defaults to the eviction horizon (one contract boundary),
    * and with ONLY earlyEmit set, raise `disorder` to accept stragglers
    * later than one emission interval — an output-cadence knob must not
    * silently impose a data-loss bound (the reference's early timer
    * never drops input). A disorder wider than cleanup re-admits
    * elements older than an already-evicted cell, which then folds from
    * the initial state — the standard horizon trade-off, now under the
    * caller's control.
    */
  def reduceValueStateByKey[S: org.apache.spark.sql.Encoder, O](
      stream: Dataset[StreamElement], initialState: S,
      output: (S, StreamElement) => O, update: (S, StreamElement) => S,
      cleanup: Option[FiniteDuration] = None,
      earlyEmit: Option[FiniteDuration] = None,
      stampUnit: String = "micros",
      disorder: Option[FiniteDuration] = None)(
      implicit oe: org.apache.spark.sql.Encoder[(String, O)]): Dataset[(String, O)] = {
    implicit val ke = Encoders.STRING
    // state envelope: (fold state, last event ms, last emission ms) —
    // both clocks on the STAMP domain; MinValue until data arrives
    implicit val envEnc: org.apache.spark.sql.Encoder[((S, Long), Long)] =
      Encoders.tuple(
        Encoders.tuple(implicitly[org.apache.spark.sql.Encoder[S]],
          Encoders.scalaLong), Encoders.scalaLong)
    val timerOn = cleanup.isDefined || earlyEmit.isDefined
    // the watermark reads as (max stamp − delayMs); deadlines below are
    // stored on the stamp clock and translated by −delayMs when arming
    val delayMs = (cleanup.toSeq ++ disorder.toSeq ++ earlyEmit.toSeq)
      .map(_.toMillis).maxOption.getOrElse(0L)
    val div = stampDivisor(stampUnit)
    val src =
      if (timerOn) withStampWatermark(stream, "stamp", stampUnit, delayMs)
      else stream
    // next timer deadline on the WATERMARK clock for a cell with the
    // given last-event/last-emission stamps (deadlines live on the stamp
    // clock; −delayMs translates to the watermark clock)
    def deadline(lastEventMs: Long, lastTickMs: Long): Long = {
      val evictAt = cleanup.map(c => lastEventMs + c.toMillis - delayMs)
      val emitAt = earlyEmit.map(e => lastTickMs + e.toMillis - delayMs)
      (evictAt.toSeq ++ emitAt.toSeq).min
    }
    src
      .groupByKey(_.key)
      .flatMapGroupsWithState[((S, Long), Long), (String, O)](
        OutputMode.Update(),
        if (timerOn) GroupStateTimeout.EventTimeTimeout()
        else GroupStateTimeout.NoTimeout()) {
        case (key, elems, state: GroupState[((S, Long), Long)]) =>
          if (state.hasTimedOut) {
            val ((st, lastEventMs), lastTickMs) = state.get
            val wm = state.getCurrentWatermarkMs()
            val stampNow = wm + delayMs // max stamp the watermark vouches for
            if (cleanup.exists(c => stampNow >= lastEventMs + c.toMillis)) {
              state.remove()
              Iterator.empty
            } else if (earlyEmit.exists(e => stampNow >= lastTickMs + e.toMillis)) {
              // the reference re-arms offset(earlyEmitting) relative to
              // the firing (BeamStream.java:1620): next emission one
              // interval past this one
              state.update(((st, lastEventMs), stampNow))
              armAfter(state, wm, deadline(lastEventMs, stampNow))
              Option(output(st, null)).map(o => (key, o)).iterator
            } else {
              // armed early off a clamped/stale deadline: re-arm only
              armAfter(state, wm, deadline(lastEventMs, lastTickMs))
              Iterator.empty
            }
          } else {
            var st = state.getOption.map(_._1._1).getOrElse(initialState)
            var lastEventMs = state.getOption.map(_._1._2).getOrElse(Long.MinValue)
            // flatMap + Option: a null OUTPUT is discarded (the
            // documented Stream.java:409 contract) on the ELEMENT path
            // exactly as the timer path above discards it
            val out = elems.toSeq.sortBy(e => (e.stamp, e.seqId)).flatMap { e =>
              val o = output(st, e)
              st = update(st, e)
              lastEventMs = math.max(lastEventMs, e.stamp / div)
              Option(o).map(v => (key, v))
            }
            // an arrival restarts the emission cadence from the newest
            // element (the reference arms its early timer per element)
            if (timerOn) {
              watermarkMs(state).foreach(wm =>
                armAfter(state, wm, deadline(lastEventMs, lastEventMs)))
            }
            state.update(((st, lastEventMs), lastEventMs))
            out.iterator
          }
      }
  }
}
