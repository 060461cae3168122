package graft.tools

import java.nio.file.Files
import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.sql.{Dataset, Row, SparkSession}
import org.apache.spark.sql.streaming.Trigger

import graft.GraftSession
import graft.core.StreamElement
import graft.streaming.{StateOps, StreamingDedup}

/** Spill-capable state-store regime smoke: every stateful streaming
  * operator re-run under `RocksDBStateStoreProvider`, bit-identical vs
  * the default provider, checkpoint restart included.
  *
  * Why this is a scale gate and not a config nicety: Spark's DEFAULT
  * state store (HDFSBackedStateStoreProvider) holds every key's state in
  * executor HEAP — at 100 TB key cardinality (a perpetual crawl-frontier
  * dedup gate, a corpus-wide retract join) that is the one remaining
  * scale-killer in the streaming half. The production regime is RocksDB
  * (on-disk, spillable, the same role the reference delegates to its Beam
  * runners' state backends — reference `Stream.java:386-503`,
  * `GroovyEnvTest.testReduceValueStateByKey:645`). An operator is only
  * 100 TB-ready if its semantics are PROVIDER-INDEPENDENT: identical
  * rows under both providers, and state that survives a checkpoint
  * restart through RocksDB's sst files, not the heap it lost.
  *
  * Phase A runs the stateful query slice (StateOps lowerings, RetractJoin,
  * StreamingDedup, CachedView, event-time window machinery, and the
  * foreachBatch store replications) on the DEFAULT provider — the truth.
  * Phase B re-runs all of them on a RocksDB-configured session and
  * asserts bit-identical canonical rows, plus a LIVENESS proof that the
  * provider actually engaged (progress events must report rocksdb*
  * custom metrics — a typo'd conf would otherwise compare default against
  * default forever). Phase C stops mid-stream and RESTARTS from the
  * RocksDB checkpoint on the two most state-revealing ops:
  *   - integratePerKey: running sums must CONTINUE from restored
  *     accumulators (a lost store restarts every key at `initial`);
  *   - StreamingDedup.firstClaim: re-offered keys must name their
  *     original claimant (a lost store lets every key be claimed twice).
  *
  * Run: `sbt "runMain graft.tools.RocksDbSmoke /root/testdata/sf0.001"`.
  * Prints one `ROCKS <name> ... MATCH|DIVERGED` line per check plus a
  * JSON summary; exits nonzero on any divergence or a dead provider.
  */
object RocksDbSmoke {

  val RocksProvider =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  /** Every query row that starts a stateful streaming query (state-store
    * users) or a foreachBatch store replication (checkpointed offsets).
    */
  val StatefulQueries: Seq[String] = Seq(
    // StateOps lowerings (flatMapGroupsWithState)
    "q_integrate_per_key_stream", "q_reduce_value_state_stream",
    "q_reduce_value_state_early",
    // RetractJoin (+/- changelog with per-key state)
    "q_retract_join",
    // StreamingDedup (first-claim + band-hit state)
    "q_dedup_stream", "q_url_dedup_stream",
    // CachedView machinery
    "q_snapshot_updates_stream", "q_cached_view",
    // event-time windows: early emit, lateness split, watermark state
    "q_window_early_emit_stream", "q_late_drop", "q_late_split",
    "q_watermark_shift", "q_unbounded_count",
    // foreachBatch serving-store replication (offset state, no op state)
    "q_ivf_store_stream", "q_pq_store_stream", "q_bm25_store_stream")

  /** Progress events whose state operators report rocksdb custom metrics
    * — the proof the configured provider engaged.
    */
  private val rocksProof = new AtomicLong

  private def addRocksListener(spark: SparkSession): Unit =
    spark.streams.addListener(
      new org.apache.spark.sql.streaming.StreamingQueryListener {
        override def onQueryStarted(
            e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryStartedEvent): Unit = ()
        override def onQueryProgress(
            e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryProgressEvent): Unit = {
          val ops = e.progress.stateOperators
          if (ops != null && ops.exists { op =>
              val m = op.customMetrics
              m != null && m.keySet().stream()
                .anyMatch(k => k.toLowerCase.contains("rocksdb"))
            }) { rocksProof.incrementAndGet(); () }
        }
        override def onQueryTerminated(
            e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryTerminatedEvent): Unit = ()
      })

  /** Run a streaming source until AvailableNow drains and return the rows
    * this RUN emitted. foreachBatch, not the memory sink: only
    * checkpoint-recoverable sinks can prove a RESTART restores state (the
    * memory sink refuses recovery outright), and two runs on one
    * checkpoint concatenate to the committed-offset-exact whole.
    */
  private def collectRun[T](spark: SparkSession, src: Dataset[T],
      cp: String, name: String): Seq[Row] = {
    val buf = scala.collection.mutable.ArrayBuffer.empty[Row]
    val q = src.toDF().writeStream
      .outputMode("update")
      .option("checkpointLocation", cp)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        val rows = b.collect()
        buf.synchronized { buf ++= rows }
        ()
      }
      .start()
    q.awaitTermination()
    buf.toSeq
  }

  private def canonRows(rows: Seq[Row]): Seq[String] =
    rows.map(r => r.toSeq.map(LocalClusterSmoke.cell).mkString("|")).sorted

  // ---- phase C fixtures (deterministic, written once, split in two) ----

  private def intElems(ids: Range): Seq[StreamElement] =
    ids.map { i =>
      StreamElement("e", s"u${i % 10}", "v", s"uuid-$i", i.toLong,
        1000L + i * 1000L, Array[Byte]((i % 7).toByte), delete = false,
        deleteWildcard = false)
    }

  /** Append one SEGMENT of a feed as a single file with its own mtime:
    * FileStreamSource orders files by modification time, so a parallel
    * multi-file write makes batch order nondeterministic — and the
    * stateful ops under test are (by contract) batch-order-sensitive, so
    * the fixture must pin the order, not the comparison hide it.
    */
  private def writeSegment(df: org.apache.spark.sql.DataFrame,
      dir: String): Unit = {
    df.coalesce(1).write.mode("append").parquet(dir)
    Thread.sleep(20)
  }

  /** integratePerKey over a two-part feed with a restart between the
    * parts: emitted rows are (key, stamp, running sum). Continuation is
    * only correct if the restored state carries part 1's accumulators.
    */
  private def integrateRun(spark: SparkSession, feed: String,
      cp: String, name: String): Seq[Row] = {
    val src = spark.readStream
      .schema(StreamElement.encoder.schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(feed)
      .as[StreamElement](StreamElement.encoder)
    collectRun(spark,
      StateOps.integratePerKey(src, 0.0, _.value.head.toDouble, _ + _),
      cp, name)
  }

  /** firstClaim over a two-part feed: part 2 re-offers every key with
    * strictly larger doc_ids — each must name part 1's claimant, which
    * only a restored store knows.
    */
  private def claimRun(spark: SparkSession, feed: String,
      cp: String, name: String): Seq[Row] = {
    import spark.implicits._
    val src = spark.readStream
      .schema(org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("_1",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("_2",
          org.apache.spark.sql.types.LongType))))
      .option("maxFilesPerTrigger", 1)
      .parquet(feed)
      .as[(Long, Long)]
    collectRun(spark, StreamingDedup.firstClaim(src), cp, name)
  }

  private final case class Outcome(name: String, rows: Int, ok: Boolean,
      detail: String = "")

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val outcomes = scala.collection.mutable.ArrayBuffer.empty[Outcome]

    val scratch = Files.createTempDirectory("rocks-smoke-").toString
    def tmp(p: String): String = { val d = s"$scratch/$p"; d }

    // ---- phase A: truth on the default (HDFS-backed) provider
    val local = GraftSession.builder("4").getOrCreate()
    local.sparkContext.setLogLevel("WARN")
    val expected = LocalClusterSmoke.runAll(local, sfDir, StatefulQueries)

    // phase-C truths: one-shot runs over the FULL feeds, default provider.
    // Feeds are written segment-by-segment (one file, one mtime, one
    // micro-batch each) so the batch order — which the ops' semantics
    // legitimately depend on — is identical between the one-shot truth
    // and the split-restart probe.
    {
      import local.implicits._
      (0 until 8).foreach(s => writeSegment(
        local.createDataset(intElems(s * 25 until (s + 1) * 25))(
          StreamElement.encoder).toDF(), tmp("int-full")))
      Seq((0L until 25L), (25L until 50L), (100L until 125L), (125L until 150L))
        .foreach(r => writeSegment(
          r.map(i => (i, i % 10)).toDF("_1", "_2"), tmp("claim-full")))
    }
    val intTruth = canonRows(integrateRun(local, tmp("int-full"),
      tmp("cp-int-truth"), "rocks_int_truth"))
    val claimTruth = canonRows(claimRun(local, tmp("claim-full"),
      tmp("cp-claim-truth"), "rocks_claim_truth"))
    require(intTruth.size == 200 && claimTruth.size == 100,
      s"phase-C truth fixture wrong: ${intTruth.size}/${claimTruth.size}")
    graft.core.CachePins.releaseAll()
    LocalClusterSmoke.stop(local)
    graft.streaming.EmbeddedKafka.reset()

    // ---- phase B: the same slice under RocksDB, bit-identical
    val rocks = GraftSession.builder("4")
      .config("spark.sql.streaming.stateStore.providerClass", RocksProvider)
      .getOrCreate()
    rocks.sparkContext.setLogLevel("WARN")
    addRocksListener(rocks)
    try {
      StatefulQueries.foreach { n =>
        val got =
          try LocalClusterSmoke.canon(graft.SparkEntry.queries(n)(rocks, sfDir))
          catch { case e: Exception =>
            e.printStackTrace()
            Seq(s"<threw ${e.getClass.getName}: ${e.getMessage}>") }
        val exp = expected(n)
        val detail =
          if (got == exp) ""
          else got.zipAll(exp, "<missing>", "<missing>")
            .find(p => p._1 != p._2)
            .map(p => s" firstDiff=rocksdb:${p._1.take(120)} default:${p._2.take(120)}")
            .getOrElse(" <sizes differ>")
        outcomes += Outcome(s"query:$n", got.size, got == exp, detail)
        graft.core.CachePins.releaseAll()
        rocks.catalog.clearCache()
      }

      // ---- phase C: checkpoint RESTART through the RocksDB files
      // C1: integratePerKey — part 1, stop, part 2, restart, same cp
      {
        import rocks.implicits._
        (0 until 4).foreach(s => writeSegment(
          rocks.createDataset(intElems(s * 25 until (s + 1) * 25))(
            StreamElement.encoder).toDF(), tmp("int-split")))
        val r1 = integrateRun(rocks, tmp("int-split"), tmp("cp-int"), "rocks_int_1")
        (4 until 8).foreach(s => writeSegment(
          rocks.createDataset(intElems(s * 25 until (s + 1) * 25))(
            StreamElement.encoder).toDF(), tmp("int-split")))
        val r2 = integrateRun(rocks, tmp("int-split"), tmp("cp-int"), "rocks_int_2")
        require(r1.nonEmpty && r2.nonEmpty,
          s"restart fixture degenerate: ${r1.size}/${r2.size} — both legs must emit")
        val got = canonRows(r1 ++ r2)
        outcomes += Outcome("restart:integrate_per_key", got.size, got == intTruth,
          if (got == intTruth) ""
          else got.zipAll(intTruth, "<missing>", "<missing>")
            .find(p => p._1 != p._2)
            .map(p => s" firstDiff=got:${p._1} want:${p._2}")
            .getOrElse(" <sizes differ>"))
      }
      // C2: firstClaim — every part-2 row must remember part 1's claimant
      {
        import rocks.implicits._
        Seq((0L until 25L), (25L until 50L)).foreach(r => writeSegment(
          r.map(i => (i, i % 10)).toDF("_1", "_2"), tmp("claim-split")))
        val r1 = claimRun(rocks, tmp("claim-split"), tmp("cp-claim"), "rocks_claim_1")
        Seq((100L until 125L), (125L until 150L)).foreach(r => writeSegment(
          r.map(i => (i, i % 10)).toDF("_1", "_2"), tmp("claim-split")))
        val r2 = claimRun(rocks, tmp("claim-split"), tmp("cp-claim"), "rocks_claim_2")
        require(r1.nonEmpty && r2.nonEmpty,
          s"restart fixture degenerate: ${r1.size}/${r2.size} — both legs must emit")
        // the decisive rows: every re-offered key names a part-1 claimant
        val dupOfs = r2.map(r => Option(r.get(2))).toSeq
        val allRemembered = dupOfs.size == 50 && dupOfs.forall(_.isDefined)
        val got = canonRows(r1 ++ r2)
        outcomes += Outcome("restart:first_claim", got.size,
          got == claimTruth && allRemembered,
          if (!allRemembered) " a re-offered key was re-claimed: state lost"
          else if (got == claimTruth) ""
          else got.zipAll(claimTruth, "<missing>", "<missing>")
            .find(p => p._1 != p._2)
            .map(p => s" firstDiff=got:${p._1} want:${p._2}")
            .getOrElse(" <sizes differ>"))
      }

      val proof = rocksProof.get()
      var failed = outcomes.count(!_.ok)
      outcomes.foreach(o => println(s"ROCKS ${o.name} rows=${o.rows} " +
        (if (o.ok) "MATCH" else s"DIVERGED${o.detail}")))
      // liveness: a typo'd provider conf must fail here, not compare
      // default-vs-default forever
      if (proof == 0) {
        failed += 1
        println("ROCKS provider_liveness rows=0 DIVERGED no rocksdb state-store " +
          "metrics observed — the provider never engaged")
      } else println(s"ROCKS provider_liveness rows=$proof MATCH")
      println(s"""{"smoke":"rocksdb-state-store","queries":${StatefulQueries.size},""" +
        s""""restartScenarios":2,"rocksdbProgressEvents":$proof,"failed":$failed}""")
      if (failed > 0) sys.exit(1)
    } finally LocalClusterSmoke.stop(rocks)
  }
}
