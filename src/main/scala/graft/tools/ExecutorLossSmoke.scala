package graft.tools

import java.nio.file.Files
import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.TaskContext
import org.apache.spark.scheduler.{SparkListener, SparkListenerExecutorRemoved}
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.core.StreamElement
import graft.sources.Tables
import graft.streaming.{CommitLogFamily, EmbeddedKafka, KafkaLogFamily}

/** Executor-LOSS smoke: halt a whole executor JVM mid-query under
  * `local-cluster[2,2,2048]` and require bit-identical results — the
  * fault class [[ResilienceSmoke]]'s single-JVM task retries cannot
  * reach. Killing an executor does not just fail its running tasks: its
  * SHUFFLE MAP OUTPUTS vanish with it, so surviving reducers hit
  * FetchFailed and the scheduler must resubmit the affected map tasks
  * and re-fetch — the recovery path a 1000-executor cluster exercises
  * every time a container is preempted or OOM-killed. A sink task dying
  * with the JVM (no abort callback runs — this is `Runtime.halt`, the
  * honest analog of SIGKILL) must likewise leak nothing: the committer
  * discards the dead attempt's files, and an uncommitted DSv2 buffer
  * dies with the process.
  *
  * Each scenario plants a kill-switch inside the plan: the FIRST task
  * (across all executors) to claim the scenario's marker file halts its
  * executor with exit 137. `File.createNewFile` is atomic on the shared
  * local filesystem, so exactly one executor dies per scenario; retried
  * and relaunched executors see the marker and pass through. The truth
  * side runs the identical plan with no kill-switch. The harness
  * requires each marker to have been claimed AND at least one
  * `SparkListenerExecutorRemoved` per scenario — a smoke whose kill
  * stopped firing fails loudly instead of comparing truth to truth.
  *
  * Run (the standalone worker needs a Spark distribution to launch
  * executor JVMs, and the engine classes on the executor classpath):
  * {{{
  * SPARK_HOME=/opt/spark sbt "runMain graft.tools.ExecutorLossSmoke /root/testdata/sf0.001"
  * }}}
  */
object ExecutorLossSmoke {

  /** Pass-through that HALTS the executor JVM on the first task — across
    * the whole app — to atomically claim `markerPath`. Never triggers
    * driver-side (TaskContext is null outside a task).
    */
  private def killOnce[T](ds: Dataset[T], markerPath: String): Dataset[T] =
    ds.mapPartitions { it =>
      if (TaskContext.get() != null &&
          new java.io.File(markerPath).createNewFile()) {
        // SIGKILL analog: no shutdown hooks, no abort callbacks, the
        // executor's shuffle files and write-attempt state die with it
        Runtime.getRuntime.halt(137)
      }
      it
    }(ds.encoder)

  private val removed = new AtomicLong

  private def awaitLoss(before: Long, marker: java.io.File, what: String): Unit = {
    require(marker.exists(),
      s"$what: the kill-switch never fired — nothing was tested")
    val deadline = System.nanoTime() + 60L * 1000 * 1000 * 1000
    while (removed.get() == before && System.nanoTime() < deadline)
      Thread.sleep(50)
    require(removed.get() > before,
      s"$what: no SparkListenerExecutorRemoved observed — the halt did " +
        "not take an executor down")
  }

  private def tmp(prefix: String): String =
    Files.createTempDirectory(s"execloss-$prefix-").toString

  private def marker(name: String): java.io.File =
    new java.io.File(tmp(s"marker-$name"), "kill")

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")

    val spark = GraftSession.builder("8")
      .master("local-cluster[2,2,2048]")
      .config("spark.executor.memory", "1024m")
      .config("spark.executor.extraClassPath", System.getProperty("java.class.path"))
      .config("spark.executorEnv.SPARK_SCALA_VERSION", "2.13")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onExecutorRemoved(ev: SparkListenerExecutorRemoved): Unit = {
        removed.incrementAndGet(); ()
      }
    })

    def changelog: Dataset[StreamElement] =
      Tables.eventsAsChangelog(spark, sfDir).repartition(8)

    var failed = 0
    def check(name: String, truth: DataFrame, probe: => DataFrame,
        m: java.io.File): Unit = {
      val exp = LocalClusterSmoke.canon(truth)
      require(exp.nonEmpty, s"$name: empty truth result proves nothing")
      val before = removed.get()
      val got =
        try LocalClusterSmoke.canon(probe)
        catch { case e: Exception =>
          Seq(s"<threw ${e.getClass.getName}: ${e.getMessage}>") }
      awaitLoss(before, m, name)
      val ok = got == exp
      if (!ok) failed += 1
      println(s"EXECLOSS $name rows=${exp.size} " +
        (if (ok) "MATCH" else "DIVERGED" +
          s" firstDiff=${got.zipAll(exp, "<missing>", "<missing>")
            .find(p => p._1 != p._2).map(p => s"got:${p._1.take(120)} exp:${p._2.take(120)}")
            .getOrElse("<sizes differ>")}"))
    }

    try {
      // 1. executor dies at the START of the reduce stage: its map
      // outputs vanish, surviving reducers FetchFail, the scheduler
      // resubmits the lost map tasks
      val m1 = marker("shuffle")
      val agg = changelog.groupBy("key")
        .agg(count(lit(1)).as("n"), sum("seqId").as("s"))
        .as[(String, Long, Long)](org.apache.spark.sql.Encoders.product[(String, Long, Long)])
      check("shuffle_refetch_after_executor_loss",
        truth = agg.toDF("key", "n", "s"),
        probe = killOnce(agg, m1.getPath).toDF("key", "n", "s"),
        m = m1)

      // 2. executor dies mid-parquet-append: the dead attempt's task
      // files must never be committed — read-back sees exactly one copy
      val m2 = marker("parquet")
      val logT = new CommitLogFamily(spark, tmp("log-truth"))
      logT.append(changelog)
      val logC = new CommitLogFamily(spark, tmp("log-loss"))
      check("parquet_sink_executor_loss",
        truth = logT.batchUpdates().toDF(),
        probe = { logC.append(killOnce(changelog, m2.getPath)); logC.batchUpdates().toDF() },
        m = m2)

      // 3. executor dies mid-DSv2-write: its buffered commit message
      // dies with the process and must never reach the driver commit
      val m3 = marker("kafka")
      val kfT = new KafkaLogFamily(spark, EmbeddedKafka.topic("execloss", "truth"))
      kfT.append(changelog)
      val kfC = new KafkaLogFamily(spark, EmbeddedKafka.topic("execloss", "loss"))
      check("kafka_dsv2_sink_executor_loss",
        truth = kfT.batchUpdates().toDF(),
        probe = { kfC.append(killOnce(changelog, m3.getPath)); kfC.batchUpdates().toDF() },
        m = m3)

      // 4. executor dies MID-MICRO-BATCH of a stateful streaming query
      // (StateOps.integratePerKey): the state store version being built
      // and the dead attempt's sink output must both be discarded, the
      // batch re-attempted on the survivor, and — after a deliberate
      // stop + checkpoint RESTART with more input — the final result
      // must equal the uninjected truth. The sink is the idempotent
      // foreachBatch recipe (overwrite-by-batchId), exactly-once across
      // restarts; feeds are one-file-per-segment so batch order is
      // pinned between truth and probe (the RocksDbSmoke discipline).
      val m4 = marker("stream-state")
      def segment(r: Range): Dataset[StreamElement] =
        spark.createDataset(r.map { i =>
          StreamElement("e", s"u${i % 10}", "v", s"uuid-$i", i.toLong,
            1000L + i * 1000L, Array[Byte]((i % 7).toByte), delete = false,
            deleteWildcard = false)
        })(StreamElement.encoder)
      def writeSeg(r: Range, dir: String): Unit = {
        segment(r).toDF().coalesce(1).write.mode("append").parquet(dir)
        Thread.sleep(20) // distinct mtimes: deterministic batch order
      }
      def runStream(feed: String, cp: String, out: String,
          kill: Option[String]): Unit = {
        val src = spark.readStream
          .schema(StreamElement.encoder.schema)
          .option("maxFilesPerTrigger", 1)
          .parquet(feed)
          .as[StreamElement](StreamElement.encoder)
        val armed = kill.map(mk => killOnce(src, mk)).getOrElse(src)
        val folded = graft.streaming.StateOps
          .integratePerKey(armed, 0.0, _.value.head.toDouble, _ + _)
        val q = folded.toDF().writeStream
          .outputMode("update")
          .option("checkpointLocation", cp)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .foreachBatch { (b: DataFrame, id: Long) =>
            b.write.mode("overwrite").parquet(s"$out/batch=$id")
            ()
          }
          .start()
        q.awaitTermination()
      }
      val truthDir = tmp("stream-truth")
      (0 until 8).foreach(s => writeSeg(s * 25 until (s + 1) * 25,
        s"$truthDir/feed"))
      runStream(s"$truthDir/feed", s"$truthDir/cp", s"$truthDir/out", None)
      val lossDir = tmp("stream-loss")
      val before4 = removed.get()
      (0 until 4).foreach(s => writeSeg(s * 25 until (s + 1) * 25,
        s"$lossDir/feed"))
      // leg 1: executor halts mid-batch; task retry finishes the run
      runStream(s"$lossDir/feed", s"$lossDir/cp", s"$lossDir/out",
        Some(m4.getPath))
      awaitLoss(before4, m4, "streaming_state_executor_loss")
      // leg 2: genuine checkpoint restart with the rest of the feed —
      // restored state must CONTINUE the running sums
      (4 until 8).foreach(s => writeSeg(s * 25 until (s + 1) * 25,
        s"$lossDir/feed"))
      runStream(s"$lossDir/feed", s"$lossDir/cp", s"$lossDir/out", None)
      locally {
        val exp = LocalClusterSmoke.canon(spark.read.parquet(s"$truthDir/out")
          .drop("batch"))
        val got = LocalClusterSmoke.canon(spark.read.parquet(s"$lossDir/out")
          .drop("batch"))
        require(exp.size == 200, s"streaming truth fixture wrong: ${exp.size}")
        val ok = got == exp
        if (!ok) failed += 1
        println(s"EXECLOSS streaming_state_executor_loss rows=${exp.size} " +
          (if (ok) "MATCH" else "DIVERGED" +
            s" firstDiff=${got.zipAll(exp, "<missing>", "<missing>")
              .find(p => p._1 != p._2).map(p => s"got:${p._1.take(120)} exp:${p._2.take(120)}")
              .getOrElse("<sizes differ>")}"))
      }

      println(s"""{"smoke":"executor-loss","scenarios":4,""" +
        s""""executorsRemoved":${removed.get()},"failed":$failed}""")
      if (failed > 0) sys.exit(1)
    } finally LocalClusterSmoke.stop(spark)
  }
}
