package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec
import graft.core.StreamElement

/** Restart recovery for the retract join: the per-join-key MapStates and
  * the sequence counter live in the state store, so a query restarted
  * from its checkpoint must emit retractions against values it learned
  * BEFORE the restart, with seq numbers continuing where they left off
  * (the reference's retract state is Beam MapState, recovered by the
  * runner the same way — RetractMostRecentJoinFn:176).
  */
class RetractJoinRecoverySpec extends SparkSpec {

  private def el(key: String, stamp: Long, v: String, delete: Boolean = false) =
    StreamElement("e", key, "a", s"$key-$stamp", 0L, stamp,
      if (delete) null else v.getBytes("UTF-8"), delete, deleteWildcard = false)

  test("restarted query retracts pre-restart pairs and continues seq numbers") {
    implicit val sq = spark.sqlContext
    implicit val enc = StreamElement.encoder
    implicit val ce = org.apache.spark.sql.Encoders.product[RetractJoin.Change]
    val cp = Files.createTempDirectory("rj-recovery-cp").toString
    val seen = new java.util.concurrent.ConcurrentLinkedQueue[RetractJoin.Change]()

    val left = MemoryStream[StreamElement]
    val right = MemoryStream[StreamElement]
    val changes = RetractJoin(left.toDS(), _ => "J", right.toDS(), _ => "J")
    def start() = changes.writeStream
      .option("checkpointLocation", cp)
      .outputMode("update")
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[RetractJoin.Change], _: Long) =>
        batch.collect().foreach(seen.add)
      }
      .start()

    // run 1: one pair forms
    val q1 = start()
    try {
      left.addData(el("l1", 1, "v1"))
      right.addData(el("r1", 2, "w1"))
      q1.processAllAvailable()
    } finally q1.stop()
    val afterRun1 = seen.toArray(Array.empty[RetractJoin.Change])
    assert(afterRun1.length == 1 && afterRun1.head.isAddition)

    // run 2, SAME checkpoint: the update must retract the pre-restart
    // pair — possible only if the join state survived the restart
    left.addData(el("l1", 5, "v2"))
    val q2 = start()
    try q2.processAllAvailable() finally q2.stop()

    val all = seen.toArray(Array.empty[RetractJoin.Change]).sortBy(_.seq)
    assert(all.length == 3, s"expected add, retract, add — got ${all.toSeq}")
    assert(all.map(_.seq).toSeq == Seq(0L, 1L, 2L),
      "seq numbers must continue across the restart (nextSeq recovered)")
    assert(!all(1).isAddition &&
      new String(all(1).leftValue, "UTF-8") == "v1" &&
      new String(all(1).rightValue, "UTF-8") == "w1",
      "the retraction must carry the PRE-restart pair")
    assert(all(2).isAddition && new String(all(2).leftValue, "UTF-8") == "v2")
    assert(RetractJoin.currentResult(all.toSeq).map(c =>
      new String(c.leftValue, "UTF-8")) == Seq("v2"))
  }
}
