package graft.tools

import graft.streaming.Watermarks.{BoundedOutOfOrdernessEstimator, FileGlobalWatermarkTracker, TrackedEstimator}

/** Child-JVM driver for the cross-process global watermark tracker
  * ([[graft.streaming.Watermarks.FileGlobalWatermarkTracker]]) — each
  * invocation is one REPORTING PROCESS, so the spec's scenarios exercise
  * real multi-JVM coordination through the shared directory (the
  * deployment shape of the reference's ZK tracker: many consumers, one
  * coordination root).
  *
  * Modes:
  *  - `report <dir> <staleMs> <process> <v1,v2,...>`: update each value
  *    in order, print the global after each;
  *  - `finish <dir> <staleMs> <process>`;
  *  - `consume <dir> <staleMs> <process> <logDir> <cpDir>`: the
  *    END-TO-END shape — a REAL streaming query over a commit log
  *    (one segment per micro-batch) whose per-batch max stamp feeds a
  *    [[TrackedEstimator]] reporting into the shared tracker from
  *    inside the running micro-batch loop (the reference's
  *    BlockingQueueLogObserver → GlobalWatermarkTracker path). Restarts
  *    resume from `cpDir`, so a stalled consumer re-run continues where
  *    it stopped and its watermark report advances accordingly.
  */
object WatermarkSmoke {
  def main(args: Array[String]): Unit = {
    val tracker = new FileGlobalWatermarkTracker(args(1), args(2).toLong)
    args(0) match {
      case "report" =>
        args(4).split(',').map(_.toLong).foreach { v =>
          tracker.update(args(3), v)
          println(s"WM ${args(3)} reported $v global=${tracker.globalWatermark}")
        }
      case "finish" =>
        tracker.finished(args(3))
        println(s"WM ${args(3)} finished global=${tracker.globalWatermark}")
      case "consume" =>
        val (process, logDir, cpDir) = (args(3), args(4), args(5))
        val spark = graft.GraftSession.builder("2").master("local[2]")
          .getOrCreate()
        try {
          val fam = new graft.streaming.CommitLogFamily(spark, logDir)
          // zero tolerated disorder: the report is exactly the max stamp
          // seen, so the spec's gate math is closed-form
          val est = new TrackedEstimator(process,
            new BoundedOutOfOrdernessEstimator(0), tracker.update)
          val q = fam.streamFromOldestThrottled(maxFilesPerTrigger = 1)
            .writeStream
            .option("checkpointLocation", cpDir)
            .foreachBatch {
              (b: org.apache.spark.sql.Dataset[graft.core.StreamElement],
                  id: Long) =>
                val mx = b.agg(org.apache.spark.sql.functions
                  .max(org.apache.spark.sql.functions.col("stamp")))
                  .head()
                if (!mx.isNullAt(0)) est.update(mx.getLong(0))
                println(s"WM $process batch=$id wm=${est.watermark} " +
                  s"global=${tracker.globalWatermark}")
            }
            .start()
          q.processAllAvailable(); q.stop()
          println(s"WM $process consumed wm=${est.watermark} " +
            s"global=${tracker.globalWatermark}")
        } finally spark.stop()
      case other => sys.error(s"unknown mode $other")
    }
  }
}
