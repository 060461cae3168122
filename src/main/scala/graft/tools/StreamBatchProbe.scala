package graft.tools

import graft.{GraftSession, SparkEntry}

/** Per-micro-batch duration breakdown for the memory-sink streaming
  * oracle rows (optimization-guide §1 "measure first"): runs each named
  * query exactly like Bench and, through the [[graft.queries.StreamSupport]]
  * probe seam, prints every micro-batch's `durationMs` map — the
  * planner/WAL/state/sink attribution Spark already collects
  * (triggerExecution = whole trigger; queryPlanning = incremental
  * re-plan; walCommit/commitOffsets = offset+commit log writes;
  * addBatch = the jobs themselves; getBatch/latestOffset = source
  * listing). Measurement only — never in the bench path.
  *
  * Usage: runMain graft.tools.StreamBatchProbe q_a q_b ...
  * (SPARK_GRAFT_SF_DIR picks the data dir, default sf0.1.)
  */
object StreamBatchProbe {

  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: StreamBatchProbe <query> [query ...]")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.local()
    val unknown = args.toSet -- SparkEntry.queries.keySet
    require(unknown.isEmpty, s"unknown queries: ${unknown.mkString(", ")}")
    // same warm-up as Bench: JIT/codegen on the smallest SF
    args.foreach { n =>
      try SparkEntry.queries(n)(spark, "/root/testdata/sf0.001").count()
      catch { case _: Throwable => () }
    }
    graft.core.CachePins.releaseAll()
    spark.catalog.clearCache()

    args.foreach { name =>
      System.gc()
      val batches = collection.mutable.ArrayBuffer
        .empty[(Long, Long, Map[String, Long])]
      graft.queries.StreamSupport.probe = Some { q =>
        q.recentProgress.foreach { p =>
          import scala.jdk.CollectionConverters._
          batches += ((p.batchId, p.numInputRows,
            p.durationMs.asScala.map { case (k, v) => k -> v.longValue() }.toMap))
        }
      }
      val t0 = System.nanoTime()
      try SparkEntry.queries(name)(spark, sfDir).count()
      finally graft.queries.StreamSupport.probe = None
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"$name%-32s $sec%7.2f s, ${batches.size} batches")
      val keys = batches.flatMap(_._3.keys).distinct.sorted
      batches.foreach { case (id, rows, d) =>
        val cols = keys.map(k => s"$k=${d.getOrElse(k, -1L)}").mkString(" ")
        println(f"    batch $id%2d rows=$rows%6d $cols")
      }
      if (batches.nonEmpty) {
        val tot = keys.map(k =>
          s"$k=${batches.map(_._3.getOrElse(k, 0L)).sum}").mkString(" ")
        println(s"    TOTAL $tot")
      }
      graft.core.CachePins.releaseAll()
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
