package graft.api

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec
import graft.core.StreamElement

/** Typed unbounded surface over MemoryStream inputs: element-wise chains
  * feed streaming windowed aggregations; results agree with the batch
  * GStream lowering on the same data (the dual-mode contract).
  */
class UnboundedStreamSpec extends SparkSpec {

  private implicit def sq = spark.sqlContext
  import SparkSpec.spark.implicits._

  private def up(key: String, stampMs: Long, v: Double) =
    StreamElement("e", key, "m", s"u-$key-$stampMs-$v", 0, stampMs * 1000,
      v.toString.getBytes("UTF-8"), delete = false, deleteWildcard = false)

  test("tumbling sum per key on a stream equals the batch lowering") {
    implicit val enc = StreamElement.encoder
    val input = MemoryStream[StreamElement]
    val out = GUnboundedStream.ofElements(input.toDS())
      .filter(e => !e.delete)
      .tumblingAggByKey(10000, 1000)(
        _.key, e => new String(e.value, "UTF-8").toDouble)
    val q = out.writeStream.format("memory").queryName("unb_tumbling")
      .outputMode("update").start()
    try {
      input.addData(up("a", 1000, 1.0), up("a", 2000, 2.0), up("b", 3000, 5.0))
      q.processAllAvailable()
      input.addData(up("a", 12000, 10.0))
      q.processAllAvailable()
      // update mode re-emits a window as it grows; the final value is the max
      val rows = spark.sql(
        "SELECT w_start_us, key, max(agg) FROM unb_tumbling GROUP BY 1, 2")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
      assert(rows == Set((0L, "a", 3.0), (0L, "b", 5.0), (10000000L, "a", 10.0)))
    } finally q.stop()
  }

  test("sliding count and session sum over streams") {
    implicit val enc = StreamElement.encoder
    val input = MemoryStream[StreamElement]
    val base = GUnboundedStream.ofElements(input.toDS())
    val sliding = base.slidingAggByKey(4000, 2000, 0)(
      _.key, _ => 1.0, how = "count")
    val q1 = sliding.writeStream.format("memory").queryName("unb_sliding")
      .outputMode("update").start()
    // session windows only support append mode on streams: a session is
    // emitted once, when the watermark passes its end
    val session = base.sessionAggByKey(5000, 0)(
      _.key, e => new String(e.value, "UTF-8").toDouble)
    val q2 = session.writeStream.format("memory").queryName("unb_session")
      .outputMode("append").start()
    try {
      input.addData(up("k", 1000, 1.0), up("k", 3000, 2.0), up("k", 20000, 4.0))
      q1.processAllAvailable(); q2.processAllAvailable()
      // advance the watermark past the second session's end to finalize it
      input.addData(up("k", 40000, 0.5))
      q1.processAllAvailable(); q2.processAllAvailable()
      // sliding 4s/2s: [0,4s) holds stamps 1s+3s; [2s,6s) holds 3s only
      val slid = spark.sql(
        "SELECT w_start_us, max(agg) FROM unb_sliding GROUP BY 1")
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
      assert(slid(0L) == 2.0)
      assert(slid(2000000L) == 1.0)
      assert(slid(-2000000L) == 1.0) // [-2s,2s) holds stamp 1s
      // sessions: 1000+3000 merge (gap 5s), 20000 is its own session; the
      // 40000 session is still open (watermark at 40s < its end)
      val sess = spark.sql(
        "SELECT s_start_us, s_end_us, agg FROM unb_session")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(sess == Set((1000000L, 8000000L, 3.0), (20000000L, 25000000L, 4.0)))
    } finally { q1.stop(); q2.stop() }
  }
}
