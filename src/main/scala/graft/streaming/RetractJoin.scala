package graft.streaming

import scala.concurrent.duration.FiniteDuration

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.core.StreamElement

/** Continuously-updating (retracting) most-recent join of two keyed
  * changelogs — the reference's hardest operator
  * (reference: beam/core/.../transforms/retract/RetractJoin.java:57-140,
  * RetractMostRecentJoinFn:142-396; RetractPCollection/RetractElement for
  * the +/- element model, SequentialInstant for emission ordering).
  *
  * Semantics: per join key, the join of the MOST RECENT value per element
  * key on each side; every change emits retractions (`isAddition=false`) of
  * the no-longer-valid joined rows and additions of the new ones, each
  * stamped with a per-join-key sequence number — a changelog DataFrame a
  * downstream consumer can fold into the current join result.
  *
  * Spark lowering: both changelogs are tagged and unioned, grouped by join
  * key, and folded in a `flatMapGroupsWithState` cell holding latest-per-
  * element-key maps for both sides (the reference's two MapStates,
  * RetractMostRecentJoinFn:176). Elements are applied in (stamp, seqId)
  * order within a batch; stale arrivals (older than the held value) are
  * ignored, deletes evict. State size per join key = live element keys —
  * same bound as the reference.
  *
  * Cleanup: the reference's `join(…, cleanupDuration)` arms a per-join-key
  * EVENT-TIME timer that evicts entries older than the cleanup horizon and
  * clears the whole cell once both sides are empty (RetractJoin.java:195-213
  * timer setup, :349-371 onTimer). The Spark lowering keeps the event-time
  * domain: an `EventTimeTimeout` state timer whose idle clock is the cell's
  * newest element stamp — when the watermark passes (last event time +
  * cleanup), the ENTIRE cell is dropped (seq counter included,
  * RetractJoin.java:361-366) and a later element rebuilds it from empty.
  * ACTIVE cells additionally evict per ENTRY on every update: entries
  * whose stamp has fallen behind the horizon-lagged watermark are
  * removed from both SideState maps even while the join key stays hot
  * (the reference's entry-level horizon, RetractJoin.java:349-371) —
  * eviction emits no retractions, and the seq counter survives (only
  * the full-cell clear resets it). State per key is therefore bounded
  * by entries live WITHIN the horizon, not by the key's lifetime.
  * Elements within the horizon arriving after
  * their key was evicted join against an empty cell, and elements MORE
  * than a full horizon out of order are dropped before the operator
  * (Spark's event-time-timeout late-row filter; the attached watermark
  * is delayed by the horizon so the drop lands exactly on the contract
  * boundary) — both are the reference's contract that data older than
  * the cleanup horizon is no longer retractable. The operator attaches
  * its own watermark over the unioned element stamps (`stampUnit`
  * micros|millis) right before the stateful step — an upstream watermark
  * annotation cannot survive the tagging map, which re-creates
  * attributes without metadata. Spark's watermark is computed per
  * micro-batch, so eviction lands on the next batch boundary after the
  * horizon passes; at real cleanup horizons (minutes+) the
  * discretization is noise.
  *
  * Works identically on bounded inputs (one mega-batch): the emitted
  * changelog then ends in the final join state (batch execution never
  * fires timeouts, so `cleanup` is inert there).
  */
object RetractJoin {

  /** One +/- change of the joined relation. */
  final case class Change(
      joinKey: String,
      seq: Long,
      isAddition: Boolean,
      leftKey: String,
      rightKey: String,
      leftValue: Array[Byte],
      rightValue: Array[Byte])

  /** Latest value per element key for one side. */
  final case class SideState(
      entries: Map[String, (Long, Long, Array[Byte])]) // elemKey -> (stamp, seqId, value)

  /** `lastEventMs` = the cell's newest element stamp on the millisecond
    * clock: the idle clock the cleanup timer measures against.
    */
  final case class JoinState(left: SideState, right: SideState, nextSeq: Long,
      lastEventMs: Long)

  /** Internal union tag (public: encoder codegen requires accessible types). */
  final case class Tagged(isLeft: Boolean, joinKey: String, e: StreamElement)

  def apply(
      left: Dataset[StreamElement], leftJoinKey: StreamElement => String,
      right: Dataset[StreamElement], rightJoinKey: StreamElement => String,
      cleanup: Option[FiniteDuration] = None,
      stampUnit: String = "micros"): Dataset[Change] = {
    implicit val te = Encoders.product[Tagged]
    implicit val ce = Encoders.product[Change]
    implicit val se = Encoders.product[JoinState]
    implicit val ke = Encoders.STRING

    val tagged = left.map(e => Tagged(isLeft = true, leftJoinKey(e), e))
      .union(right.map(e => Tagged(isLeft = false, rightJoinKey(e), e)))

    val timeout =
      if (cleanup.isDefined) GroupStateTimeout.EventTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    val div = StateOps.stampDivisor(stampUnit)
    val src = cleanup match {
      case Some(c) =>
        StateOps.withStampWatermark(tagged, "e.stamp", stampUnit, c.toMillis)
      case None => tagged
    }

    src
      .groupByKey(_.joinKey)
      .flatMapGroupsWithState[JoinState, Change](
        OutputMode.Update(), timeout) {
        case (joinKey, elems, state: GroupState[JoinState]) =>
          if (state.hasTimedOut) {
            // eviction clears the whole cell, seq included (reference
            // onTimer, RetractJoin.java:361-366)
            StateOps.evictOrRearm(state, state.get.lastEventMs)
            Iterator.empty
          } else {
            var st = state.getOption.getOrElse(
              JoinState(SideState(Map.empty), SideState(Map.empty), 0L,
                Long.MinValue))
            if (cleanup.isDefined) {
              // per-entry horizon BEFORE the fold (reference onTimer
              // eviction, RetractJoin.java:349-371): even in a hot,
              // never-idle cell, entries whose stamp lags the
              // horizon-delayed watermark are dropped from both sides —
              // silently (data beyond the horizon is no longer
              // retractable), without touching the seq counter, and
              // before this batch's elements can pair against them
              StateOps.watermarkMs(state).foreach { wm =>
                if (wm > Long.MinValue) {
                  val keepL = st.left.entries.filter { case (_, (s, _, _)) => s / div >= wm }
                  val keepR = st.right.entries.filter { case (_, (s, _, _)) => s / div >= wm }
                  if (keepL.size != st.left.entries.size ||
                      keepR.size != st.right.entries.size)
                    st = st.copy(left = SideState(keepL), right = SideState(keepR))
                }
              }
            }
            val out = collection.mutable.ArrayBuffer.empty[Change]

            def emit(add: Boolean, lk: String, rk: String,
                lv: Array[Byte], rv: Array[Byte]): Unit = {
              out += Change(joinKey, st.nextSeq, add, lk, rk, lv, rv)
              st = st.copy(nextSeq = st.nextSeq + 1)
            }

            elems.toSeq.sortBy(t => (t.e.stamp, t.e.seqId)).foreach { t =>
              val e = t.e
              st = st.copy(lastEventMs = math.max(st.lastEventMs, e.stamp / div))
              val (mySide, otherSide) = if (t.isLeft) (st.left, st.right) else (st.right, st.left)
              val cur = mySide.entries.get(e.key)
              val isStale = cur.exists { case (s, q, _) =>
                s > e.stamp || (s == e.stamp && q >= e.seqId)
              }
              if (!isStale) {
                // retract pairs produced by the previous value
                cur.foreach { case (_, _, oldV) =>
                  otherSide.entries.foreach { case (ok, (_, _, ov)) =>
                    if (t.isLeft) emit(add = false, e.key, ok, oldV, ov)
                    else emit(add = false, ok, e.key, ov, oldV)
                  }
                }
                val newEntries =
                  if (e.isDelete) mySide.entries - e.key
                  else mySide.entries.updated(e.key, (e.stamp, e.seqId, e.value))
                // add pairs for the new value
                if (!e.isDelete) {
                  otherSide.entries.foreach { case (ok, (_, _, ov)) =>
                    if (t.isLeft) emit(add = true, e.key, ok, e.value, ov)
                    else emit(add = true, ok, e.key, ov, e.value)
                  }
                }
                st =
                  if (t.isLeft) st.copy(left = SideState(newEntries))
                  else st.copy(right = SideState(newEntries))
              }
            }
            if (cleanup.isDefined) {
              // (re-)arm the cleanup timer off the refreshed idle clock
              // (deadline = lastEventMs on the horizon-lagged watermark
              // clock); in batch execution there is no watermark and
              // timers never fire, so cleanup is inert there by
              // construction
              StateOps.watermarkMs(state).foreach(wm =>
                StateOps.armAfter(state, wm, st.lastEventMs))
            }
            state.update(st)
            out.iterator
          }
      }
  }

  /** Fold a change stream back into the current joined relation — the
    * RetractPCollection → PCollection "unwrap" (RetractPCollection.java).
    */
  def currentResult(changes: Seq[Change]): Seq[Change] = {
    val live = collection.mutable.LinkedHashMap.empty[(String, String, String), Change]
    changes.sortBy(c => (c.joinKey, c.seq)).foreach { c =>
      val k = (c.joinKey, c.leftKey, c.rightKey)
      if (c.isAddition) live(k) = c else live.remove(k)
    }
    live.values.toSeq
  }
}
