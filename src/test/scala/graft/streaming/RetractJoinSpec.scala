package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec
import graft.core.StreamElement

/** Retract-join semantics, mirroring the reference's most-recent-join
  * contract (reference: beam/core/.../retract/RetractJoin.java:57,
  * RetractMostRecentJoinFn:142 — additions and retractions with sequence
  * numbers; latest value per element key on each side).
  */
class RetractJoinSpec extends SparkSpec {

  private def el(key: String, stamp: Long, v: String, seq: Long = 0,
      delete: Boolean = false) =
    StreamElement("e", key, "a", s"$key-$stamp-$seq", seq, stamp,
      if (delete) null else v.getBytes("UTF-8"), delete, deleteWildcard = false)

  private def str(b: Array[Byte]): String =
    if (b == null) null else new String(b, "UTF-8")

  private implicit val changeEnc: org.apache.spark.sql.Encoder[RetractJoin.Change] =
    org.apache.spark.sql.Encoders.product[RetractJoin.Change]

  test("retract join emits additions, retractions on update, eviction on delete") {
    implicit val sq = spark.sqlContext
    implicit val enc = StreamElement.encoder
    val left = MemoryStream[StreamElement]
    val right = MemoryStream[StreamElement]
    // join key: everything joins on "J" (single-key relation)
    val changes = RetractJoin(
      left.toDS(), _ => "J",
      right.toDS(), _ => "J")
    val q = changes.writeStream.format("memory").queryName("rj")
      .outputMode("update").start()
    try {
      left.addData(el("l1", 1, "v1"))
      right.addData(el("r1", 2, "w1"))
      q.processAllAvailable()
      val c1 = spark.sql("SELECT * FROM rj").as[RetractJoin.Change].collect()
      assert(c1.length == 1 && c1.head.isAddition &&
        str(c1.head.leftValue) == "v1" && str(c1.head.rightValue) == "w1")

      // update left -> retract old pair, add new pair
      left.addData(el("l1", 5, "v2"))
      q.processAllAvailable()
      val c2 = spark.sql("SELECT * FROM rj").as[RetractJoin.Change].collect()
        .sortBy(_.seq)
      assert(c2.length == 3)
      assert(!c2(1).isAddition && str(c2(1).leftValue) == "v1")
      assert(c2(2).isAddition && str(c2(2).leftValue) == "v2")

      // stale left update (older stamp) is ignored
      left.addData(el("l1", 3, "stale"))
      q.processAllAvailable()
      assert(spark.sql("SELECT * FROM rj").count() == 3)

      // delete right -> retraction only
      right.addData(el("r1", 9, null, delete = true))
      q.processAllAvailable()
      val c4 = spark.sql("SELECT * FROM rj").as[RetractJoin.Change].collect()
        .sortBy(_.seq)
      assert(c4.length == 4)
      assert(!c4(3).isAddition && str(c4(3).leftValue) == "v2")

      // folding the changelog yields the current (now empty) relation
      assert(RetractJoin.currentResult(c4.toSeq).isEmpty)
    } finally q.stop()
  }

  test("multi-element-key sides produce the cross product per join key") {
    implicit val sq = spark.sqlContext
    implicit val enc = StreamElement.encoder
    val left = MemoryStream[StreamElement]
    val right = MemoryStream[StreamElement]
    val changes = RetractJoin(left.toDS(), _.key.take(1), right.toDS(), _.key.take(1))
    val q = changes.writeStream.format("memory").queryName("rj2")
      .outputMode("update").start()
    try {
      left.addData(el("a-l1", 1, "x"), el("a-l2", 2, "y"), el("b-l1", 1, "z"))
      right.addData(el("a-r1", 3, "p"))
      q.processAllAvailable()
      val live = RetractJoin.currentResult(
        spark.sql("SELECT * FROM rj2").as[RetractJoin.Change].collect().toSeq)
      // join key "a": {l1,l2} x {r1}; join key "b": no right side
      assert(live.map(c => (c.joinKey, c.leftKey, c.rightKey)).toSet ==
        Set(("a", "a-l1", "a-r1"), ("a", "a-l2", "a-r1")))
    } finally q.stop()
  }
}
