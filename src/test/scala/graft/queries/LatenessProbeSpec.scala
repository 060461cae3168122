package graft.queries

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.StreamElement
import graft.streaming.CommitLogFamily

/** Pins Spark's exact late-drop rule for windowed aggregation — the
  * contract `q_late_drop`'s DuckDB oracle replays:
  *   - a row is dropped iff its window END <= the late-event watermark
  *     (boundary inclusive: end == watermark still drops);
  *   - the late-event watermark in effect for batch b is the one from the
  *     PREVIOUS batch's planning, i.e. computed from data through batch
  *     b-2 (`IncrementalExecution.eventTimeWatermarkForLateEvents` is
  *     `prevOffsetSeqMetadata.batchWatermarkMs`) — so a replay needs a
  *     spacer batch between the watermark-advancing data and the late
  *     data for the drop to take effect.
  */
class LatenessProbeSpec extends SparkSpec {
  import SparkSpec.spark.implicits._

  private def elem(id: Long, stampMs: Long): StreamElement =
    StreamElement("e", s"k", "a", s"u$id", id, stampMs * 1000,
      Array[Byte](1), delete = false, deleteWildcard = false)

  test("probe: late-drop boundary under update mode") {
    val tmp = Files.createTempDirectory("graft-probe-").toString
    val fam = new CommitLogFamily(spark, s"$tmp/log")
    try {
      StagedLogs.appendOrdered(fam, Seq(
        // batch 0: max event time 25s; with 5s lateness → wm = 20s
        Seq(elem(1, 25000)).toDS(),
        // batch 1: spacer so the 20s watermark is definitely in effect
        // for batch 2 (Spark applies a new watermark one batch late);
        // same stamp keeps wm at exactly 20s so the boundary is exact
        Seq(elem(5, 25000)).toDS(),
        // batch 2 (processed with wm = 20s):
        //  id 2 → window [0,10s)   end 10s  < wm        → expect dropped
        //  id 3 → window [10,20s)  end 20s  == wm       → the boundary case
        //  id 4 → window [20,30s)  end 30s  > wm        → expect kept
        Seq(elem(2, 5000), elem(3, 15000), elem(4, 22000)).toDS()))
      val counts = fam.streamFromOldestThrottled(1)
        .withColumn("eventTime", timestamp_micros(col("stamp")))
        .withWatermark("eventTime", "5000 milliseconds")
        .groupBy(window(col("eventTime"), "10000 milliseconds"))
        .agg(count(lit(1)).as("n"))
        .select(unix_micros(col("window.start")).as("w_us"), col("n"))
      var progress: Seq[String] = Nil
      val out = StreamSupport.runToMemorySink(spark, counts) { q =>
        q.processAllAvailable()
        progress = q.recentProgress.toSeq.map(p =>
          s"batch=${p.batchId} wm=${p.eventTime.get("watermark")} " +
            s"rows=${p.numInputRows}")
      }
        .collect().map(r => (r.getLong(0) / 1000000, r.getLong(1))).toSeq
      info(progress.mkString("\n"))
      // panes across both batches, (window_start_sec, n)
      info(s"panes = ${out.sortBy(identity)}")
      assert(out.contains((20L, 1L)) && out.contains((20L, 3L)),
        s"window [20,30) panes at 1 (batch 0) then 3 (batch 2): $out")
      assert(!out.exists(_._1 == 0L), s"[0,10s) (end < wm) must drop: $out")
      assert(!out.exists(_._1 == 10L),
        s"[10,20s) (end == wm) must drop — boundary is inclusive: $out")
    } finally StagedLogs.deleteRecursively(tmp)
  }
}
