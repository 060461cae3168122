package graft.streaming

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
  * same bound as the reference; cleanup timers map to state TTL config.
  *
  * Works identically on bounded inputs (one mega-batch): the emitted
  * changelog then ends in the final join state.
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

  final case class JoinState(left: SideState, right: SideState, nextSeq: Long)

  /** Internal union tag (public: encoder codegen requires accessible types). */
  final case class Tagged(isLeft: Boolean, joinKey: String, e: StreamElement)

  def apply(
      left: Dataset[StreamElement], leftJoinKey: StreamElement => String,
      right: Dataset[StreamElement], rightJoinKey: StreamElement => String): Dataset[Change] = {
    implicit val te = Encoders.product[Tagged]
    implicit val ce = Encoders.product[Change]
    implicit val se = Encoders.product[JoinState]
    implicit val ke = Encoders.STRING

    val tagged = left.map(e => Tagged(isLeft = true, leftJoinKey(e), e))
      .union(right.map(e => Tagged(isLeft = false, rightJoinKey(e), e)))

    tagged
      .groupByKey(_.joinKey)
      .flatMapGroupsWithState[JoinState, Change](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        case (joinKey, elems, state: GroupState[JoinState]) =>
          var st = state.getOption.getOrElse(
            JoinState(SideState(Map.empty), SideState(Map.empty), 0L))
          val out = collection.mutable.ArrayBuffer.empty[Change]

          def emit(add: Boolean, lk: String, rk: String,
              lv: Array[Byte], rv: Array[Byte]): Unit = {
            out += Change(joinKey, st.nextSeq, add, lk, rk, lv, rv)
            st = st.copy(nextSeq = st.nextSeq + 1)
          }

          elems.toSeq.sortBy(t => (t.e.stamp, t.e.seqId)).foreach { t =>
            val e = t.e
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
          state.update(st)
          out.iterator
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
