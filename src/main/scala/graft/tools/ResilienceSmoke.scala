package graft.tools

import java.nio.file.Files
import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.{ExceptionFailure, TaskContext}
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.GraftSession
import graft.core.StreamElement
import graft.functions.Hash60
import graft.operators.LatestWithTombstones
import graft.randomaccess.BucketedSnapshotStore
import graft.sources.Tables
import graft.streaming.{CommitLogFamily, EmbeddedKafka, KafkaLogFamily}

/** Fault-tolerance smoke: task RETRIES and serializer variation — the two
  * cluster certainties the ordinary suite never exercises. On a
  * 1000-executor cluster tasks fail and are re-attempted as a matter of
  * course (preemption, OOM-killed containers, disk faults), and Spark's
  * contract is that a retried task is transparent: recomputation for
  * compute stages, attempt isolation for sinks. Every custom operator and
  * sink here must honor that contract — a sink that lets a failed
  * attempt's partial output leak double-writes on a real cluster while
  * passing every local[32] run forever (the same silent-divergence class
  * [[LocalClusterSmoke]] hunts at the process boundary).
  *
  * Phase A+B run under `local[4,3]` (task retries ENABLED — plain local
  * masters run with maxFailures=1, where the first failure kills the job):
  * each scenario computes a truth result with no injection, then re-runs
  * with [[ResilienceSmoke.chaos]] wrapped around its input — a
  * pass-through that consumes the ENTIRE partition and then throws on the
  * task's first attempt, the nastiest shape for a downstream writer: a
  * complete-looking partial output that must still be discarded. A
  * driver-side listener counts the injected `ChaosFailure`s per scenario;
  * a scenario that stops injecting fails loudly instead of degrading into
  * a vacuous truth==truth comparison.
  *
  * Scenarios cover both stage types (map-side pre-shuffle, final
  * post-shuffle), the custom typed Aggregator (tombstone compaction), a
  * codegen'd native expression, and every custom sink discipline:
  *   - parquet commit-log append (FileOutputCommitter attempt isolation),
  *   - the Kafka DSv2 write (records ride commit messages; an aborted
  *     attempt's buffered message must never reach the driver commit),
  *   - the bucketed store's staged-swap refresh,
  *   - a streaming foreachBatch append with retries inside the micro-batch.
  *
  * Phase C re-runs the [[LocalClusterSmoke.DefaultQueries]] slice under
  * `spark.serializer=KryoSerializer` — the most common non-default cluster
  * serializer config — and asserts bit-identical canonical rows vs the
  * phase-A session (broadcast variables and task results ride the
  * configured serializer; results must not depend on it).
  *
  * Run: `sbt "runMain graft.tools.ResilienceSmoke /root/testdata/sf0.001"`.
  * Prints one `RESIL <scenario> ... MATCH|DIVERGED` line per scenario plus
  * a JSON summary; exits nonzero on any divergence.
  */
object ResilienceSmoke {

  /** Thrown by the injector; the listener recognizes it by class name. */
  final class ChaosFailure(msg: String) extends RuntimeException(msg)

  /** Pass-through wrapper that yields every row of the partition and then
    * throws — on the task's FIRST attempt only. Retried attempts stream
    * through untouched, so the wrapped lineage is semantically the
    * identity; any visible effect of the injected failure is a
    * fault-tolerance bug in whatever consumed it.
    */
  def chaos[T](ds: Dataset[T]): Dataset[T] =
    ds.mapPartitions { it =>
      val tc = TaskContext.get()
      if (tc == null || tc.attemptNumber() > 0) it
      else {
        val stage = tc.stageId()
        val part = tc.partitionId()
        new Iterator[T] {
          override def hasNext: Boolean =
            it.hasNext || (throw new ChaosFailure(
              s"chaos-injected first-attempt failure (stage=$stage partition=$part)"))
          override def next(): T = it.next()
        }
      }
    }(ds.encoder)

  private val injected = new AtomicLong

  /** Block until the listener has delivered at least one ChaosFailure
    * past `before` (listener delivery is async wrt job completion).
    */
  private def awaitInjection(before: Long, what: String): Long = {
    val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
    while (injected.get() == before && System.nanoTime() < deadline)
      Thread.sleep(20)
    val n = injected.get() - before
    require(n > 0,
      s"$what: chaos never fired — the harness is not injecting failures " +
        "(is the master missing the maxFailures arm, or did a cached " +
        "shuffle absorb every stage?)")
    n
  }

  private final case class Outcome(name: String, rows: Int, fired: Long, ok: Boolean)

  private def compare(name: String, truth: DataFrame, probe: => DataFrame): Outcome = {
    val exp = LocalClusterSmoke.canon(truth)
    require(exp.nonEmpty, s"$name: empty truth result proves nothing")
    val before = injected.get()
    val got =
      try LocalClusterSmoke.canon(probe)
      catch { case e: Exception =>
        Seq(s"<threw ${e.getClass.getName}: ${e.getMessage}>") }
    val fired = awaitInjection(before, name)
    Outcome(name, exp.size, fired, got == exp)
  }

  private def tmp(prefix: String): String =
    Files.createTempDirectory(s"resilience-$prefix-").toString

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")

    // ---- phase A+B: retries enabled; truth and chaos share the session
    val spark = GraftSession.builder("4").master("local[4,3]").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(ev: SparkListenerTaskEnd): Unit = ev.reason match {
        // write paths wrap the task failure (SparkException: "Task failed
        // while writing rows") — recognize the injector anywhere in the
        // cause chain via the rendered stack trace
        case ef: ExceptionFailure if ef.className == classOf[ChaosFailure].getName ||
            ef.toErrorString.contains("ChaosFailure") =>
          injected.incrementAndGet(); ()
        case _ => ()
      }
    })
    import spark.implicits._

    def changelog: Dataset[StreamElement] = Tables.eventsAsChangelog(spark, sfDir)
    def wildcardLog: Dataset[StreamElement] = Tables.eventsAsWildcardChangelog(spark, sfDir)

    val outcomes = scala.collection.mutable.ArrayBuffer.empty[Outcome]

    // 1. map-side (pre-shuffle) retry transparency through a shuffled agg
    outcomes += compare("agg_map_stage_retry",
      truth = changelog.groupBy("key")
        .agg(count(lit(1)).as("n"), sum("seqId").as("s")),
      probe = chaos(changelog).groupBy("key")
        .agg(count(lit(1)).as("n"), sum("seqId").as("s")))

    // 2. final-stage (post-shuffle) retry: chaos on the agg OUTPUT
    val aggTyped = changelog.groupBy("key")
      .agg(count(lit(1)).as("n"), sum("seqId").as("s"))
      .as[(String, Long, Long)](Encoders.product[(String, Long, Long)])
    outcomes += compare("agg_result_stage_retry",
      truth = aggTyped.toDF("key", "n", "s"),
      probe = chaos(aggTyped).toDF("key", "n", "s"))

    // 3. custom typed Aggregator (tombstone compaction), chaos on BOTH
    // sides: the partial-agg stage and the post-shuffle merge stage each
    // fail once per task
    outcomes += compare("custom_aggregator_retry",
      truth = LatestWithTombstones.snapshot(wildcardLog).toDF(),
      probe = chaos(LatestWithTombstones.snapshot(chaos(wildcardLog))).toDF())

    // 4. codegen'd native Catalyst expression recomputed on retry
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id").cast("long").as("doc_id"), col("text"))
      .as[(Long, String)]
    outcomes += compare("codegen_expr_retry",
      truth = docs.toDF("doc_id", "text")
        .select(col("doc_id"), Hash60.column(col("text")).as("h")),
      probe = chaos(docs).toDF("doc_id", "text")
        .select(col("doc_id"), Hash60.column(col("text")).as("h")))

    // 5. parquet commit-log sink: the failed attempt's task file must be
    // discarded by the committer — read-back sees exactly one copy
    val logT = new CommitLogFamily(spark, tmp("log-truth"))
    logT.append(changelog.repartition(4))
    val logC = new CommitLogFamily(spark, tmp("log-chaos"))
    outcomes += compare("parquet_sink_attempt_isolation",
      truth = logT.batchUpdates().toDF(),
      probe = { logC.append(chaos(changelog.repartition(4))); logC.batchUpdates().toDF() })

    // 6. Kafka DSv2 sink: the aborted attempt's buffered commit message
    // must never reach the driver-side commit — broker holds one copy
    val kfT = new KafkaLogFamily(spark, EmbeddedKafka.topic("rsmoke", "truth"))
    kfT.append(changelog.repartition(4))
    val kfC = new KafkaLogFamily(spark, EmbeddedKafka.topic("rsmoke", "chaos"))
    outcomes += compare("kafka_dsv2_sink_attempt_isolation",
      truth = kfT.batchUpdates().toDF(),
      probe = { kfC.append(chaos(changelog.repartition(4))); kfC.batchUpdates().toDF() })

    // 6b. the WIRE kafka binding under the same chaos: here the produce
    // happens EXECUTOR-SIDE over a real socket at task commit — a failed
    // first attempt dies mid-iteration, BEFORE its commit, so nothing
    // reaches the broker for that attempt and the retry produces exactly
    // one copy. (A failure AFTER the socket produce would duplicate —
    // the documented at-least-once-per-attempt contract shared with
    // spark-sql-kafka's producer; appendIdempotent is the exactly-once
    // route.)
    val wireServer = new graft.streaming.KafkaWire.Server(0).start()
    try {
      val wb = s"tcp:127.0.0.1:${wireServer.port}"
      val wfT = new KafkaLogFamily(spark, EmbeddedKafka.topic(wb, "truth"))
      wfT.append(changelog.repartition(4))
      val wfC = new KafkaLogFamily(spark, EmbeddedKafka.topic(wb, "chaos"))
      outcomes += compare("kafka_wire_produce_retry_transparency",
        truth = wfT.batchUpdates().toDF(),
        probe = { wfC.append(chaos(changelog.repartition(4)))
          wfC.batchUpdates().toDF() })
    } finally {
      EmbeddedKafka.drop(s"tcp:127.0.0.1:${wireServer.port}", "truth")
      EmbeddedKafka.drop(s"tcp:127.0.0.1:${wireServer.port}", "chaos")
      wireServer.close()
    }

    // 7. bucketed store refresh: staged-swap rewrite driven by a delta
    // whose every job (affected-bucket discovery, staging write) fails
    // its first attempts
    val base = wildcardLog.filter(col("seqId") % 2 === 0)
    val delta = wildcardLog.filter(col("seqId") % 2 === 1)
    val storeT = new BucketedSnapshotStore(spark, tmp("store-truth"), buckets = 8)
    storeT.write(LatestWithTombstones.compactRetaining(base))
    storeT.refresh(delta)
    val storeC = new BucketedSnapshotStore(spark, tmp("store-chaos"), buckets = 8)
    storeC.write(LatestWithTombstones.compactRetaining(base))
    outcomes += compare("bucketed_refresh_retry",
      truth = storeT.contents().toDF(),
      probe = { storeC.refresh(chaos(delta)); storeC.contents().toDF() })

    // 8. streaming micro-batch with retries INSIDE the batch: every task
    // of every micro-batch fails once; the drained sink must equal the log
    val src = new CommitLogFamily(spark, tmp("stream-src"))
    src.append(changelog.repartition(4))
    val outFam = new CommitLogFamily(spark, tmp("stream-out"))
    outcomes += compare("streaming_microbatch_retry",
      truth = src.batchUpdates().toDF(),
      probe = {
        val q = chaos(src.streamFromOldest())
          .writeStream
          .option("checkpointLocation", tmp("stream-cp"))
          .trigger(Trigger.AvailableNow())
          .foreachBatch { (b: Dataset[StreamElement], _: Long) => outFam.append(b) }
          .start()
        q.awaitTermination()
        outFam.batchUpdates().toDF()
      })

    // chaos wrapper preserving the embedding column's element type (the
    // stores' append guard enforces float-vs-double file compatibility,
    // so the wrapper must not widen)
    def chaosEmb(df: DataFrame): DataFrame = {
      val elem = df.schema("embedding").dataType
        .asInstanceOf[org.apache.spark.sql.types.ArrayType].elementType
      val typed = df.select(col("vec_id").cast("long"), col("embedding"))
      val wrapped =
        if (elem == org.apache.spark.sql.types.FloatType)
          chaos(typed.as[(Long, Array[Float])](
            Encoders.product[(Long, Array[Float])])).toDF()
        else
          chaos(typed.as[(Long, Array[Double])](
            Encoders.product[(Long, Array[Double])])).toDF()
      wrapped.toDF("vec_id", "embedding")
    }

    // 9. IVF vector-store idempotent fold under retry: the anti-join
    // discovery job AND the staged append job each fail their first
    // attempts; the store must hold each vector exactly once
    val emb = graft.sources.Tables.embeddings(spark, sfDir)
    val centroids = graft.functions.Ivf.train(emb, nCentroids = 4, maxIter = 5)
    val ivfT = new graft.functions.IvfStore(spark, tmp("ivf-truth") + "/v", centroids)
    ivfT.write(emb.filter(col("vec_id") < 100))
    ivfT.appendIdempotent(emb.filter(col("vec_id") >= 50))
    val ivfC = new graft.functions.IvfStore(spark, tmp("ivf-chaos") + "/v", centroids)
    ivfC.write(emb.filter(col("vec_id") < 100))
    outcomes += compare("ivf_append_idempotent_retry",
      truth = ivfT.contents().drop("cell"),
      probe = {
        ivfC.appendIdempotent(chaosEmb(emb.filter(col("vec_id") >= 50)))
        ivfC.contents().drop("cell")
      })

    // 10. PQ code-store append under retry: encode+assign+write with
    // first attempts failing; codes land exactly once
    val cb = graft.functions.Pq.train(emb, m = 4, k = 8, maxIter = 5)
    val pqT = new graft.functions.PqStore(spark, tmp("pq-truth") + "/v", cb, centroids)
    pqT.write(emb.filter(col("vec_id") < 100))
    pqT.append(emb.filter(col("vec_id") >= 100))
    val pqC = new graft.functions.PqStore(spark, tmp("pq-chaos") + "/v", cb, centroids)
    pqC.write(emb.filter(col("vec_id") < 100))
    outcomes += compare("pq_store_append_retry",
      truth = pqT.contents().drop("cell"),
      probe = {
        pqC.append(chaosEmb(emb.filter(col("vec_id") >= 100)))
        pqC.contents().drop("cell")
      })

    // keep the serializer-parity truth before tearing the session down
    val kryoSlice = LocalClusterSmoke.DefaultQueries
    val expected = LocalClusterSmoke.runAll(spark, sfDir, kryoSlice)
    graft.core.CachePins.releaseAll()
    LocalClusterSmoke.stop(spark)
    EmbeddedKafka.reset() // the Kryo session must rebuild its topics

    // ---- phase C: Kryo serializer parity over the query slice
    val kryo = GraftSession.builder("4")
      .config("spark.serializer", "org.apache.spark.serializer.KryoSerializer")
      .getOrCreate()
    kryo.sparkContext.setLogLevel("WARN")
    var failed = 0
    try {
      outcomes.foreach { o =>
        if (!o.ok) failed += 1
        println(s"RESIL ${o.name} rows=${o.rows} injected=${o.fired} " +
          (if (o.ok) "MATCH" else "DIVERGED"))
      }
      kryoSlice.foreach { n =>
        val got =
          try LocalClusterSmoke.canon(graft.SparkEntry.queries(n)(kryo, sfDir))
          catch { case e: Exception =>
            e.printStackTrace()
            Seq(s"<threw ${e.getClass.getName}: ${e.getMessage}>") }
        val ok = got == expected(n)
        if (!ok) failed += 1
        println(s"RESIL kryo:$n rows=${got.size} " + (if (ok) "MATCH" else "DIVERGED" +
          s" firstDiff=${got.zipAll(expected(n), "<missing>", "<missing>")
            .find(p => p._1 != p._2).map(p => s"kryo:${p._1.take(120)} default:${p._2.take(120)}")
            .getOrElse("<sizes differ>")}"))
      }
      println(s"""{"smoke":"resilience","scenarios":${outcomes.size},""" +
        s""""kryoQueries":${kryoSlice.size},"injectedFailures":${injected.get()},""" +
        s""""failed":$failed}""")
      if (failed > 0) sys.exit(1)
    } finally LocalClusterSmoke.stop(kryo)
  }
}
