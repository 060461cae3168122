package graft.tools

import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted, SparkListenerTaskEnd}

import graft.{GraftSession, SparkEntry}

/** Per-query cost breakdown (optimization-guide §1 "measure first"):
  * runs each named query exactly like Bench (same session defaults,
  * same sf0.001 warm-up, same `.count()` action, cache cleared between
  * queries) with a [[SparkListener]] attached, and prints one line per
  * query attributing the wall time to cluster work:
  *
  *   jobs / stages / tasks   — scheduling overhead (a query spending
  *                             its seconds on 40 tiny jobs is
  *                             latency-bound, not data-bound);
  *   taskTime                — summed executor task time (taskTime ≪
  *                             wall·cores ⇒ the cluster sat idle:
  *                             driver work, barriers, or job gaps);
  *   shuffleR/W, input       — bytes moved (guide §2: the first lever
  *                             is shuffling fewer bytes).
  *
  * Usage: runMain graft.tools.QueryProfile q_a q_b ...
  * (SPARK_GRAFT_SF_DIR picks the data dir, default sf0.1.)
  */
object QueryProfile {

  final class Acc extends SparkListener {
    val jobs = new AtomicInteger
    val stages = new AtomicInteger
    val tasks = new AtomicInteger
    val taskTimeMs = new AtomicLong
    val shufR = new AtomicLong
    val shufW = new AtomicLong
    val input = new AtomicLong
    override def onJobStart(j: SparkListenerJobStart): Unit = { jobs.incrementAndGet(); () }
    override def onStageCompleted(s: SparkListenerStageCompleted): Unit = { stages.incrementAndGet(); () }
    override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
      tasks.incrementAndGet()
      val m = t.taskMetrics
      if (m != null) {
        taskTimeMs.addAndGet(m.executorRunTime)
        shufR.addAndGet(m.shuffleReadMetrics.totalBytesRead)
        shufW.addAndGet(m.shuffleWriteMetrics.bytesWritten)
        input.addAndGet(m.inputMetrics.bytesRead)
      }
      ()
    }
    def snapshot: Seq[Long] = Seq(jobs.get.toLong, stages.get.toLong,
      tasks.get.toLong, taskTimeMs.get, shufR.get, shufW.get, input.get)
  }

  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: QueryProfile <query> [query ...]")
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

    val acc = new Acc
    spark.sparkContext.addSparkListener(acc)
    println(f"${"query"}%-32s ${"sec"}%7s ${"jobs"}%5s ${"stages"}%6s ${"tasks"}%6s ${"taskSec"}%8s ${"shufR_MB"}%9s ${"shufW_MB"}%9s ${"input_MB"}%9s")
    args.foreach { name =>
      System.gc()
      val before = acc.snapshot
      val mBefore = graft.core.Metrics.snapshot
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir).count()
      val sec = (System.nanoTime() - t0) / 1e9
      // listener bus is async; give it a moment to drain
      Thread.sleep(300)
      val after = acc.snapshot
      val d = after.zip(before).map { case (a, b) => a - b }
      println(f"$name%-32s $sec%7.2f ${d(0)}%5d ${d(1)}%6d ${d(2)}%6d ${d(3) / 1000.0}%8.1f ${d(4) / 1048576.0}%9.1f ${d(5) / 1048576.0}%9.1f ${d(6) / 1048576.0}%9.1f")
      // engine counters that moved during this query (loop rounds etc.)
      val mAfter = graft.core.Metrics.snapshot
      val moved = mAfter.collect { case (k, v)
        if v != mBefore.getOrElse(k, 0L) => s"$k+${v - mBefore.getOrElse(k, 0L)}" }
      if (moved.nonEmpty) println(s"    [counters] ${moved.toSeq.sorted.mkString(" ")}")
      graft.core.CachePins.releaseAll()
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
