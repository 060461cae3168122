package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.{GraftSession, SparkEntry}

/** Executor-boundary smoke: run a serialization-sensitive slice of
  * [[SparkEntry.queries]] under `local-cluster[2,2,2048]` — REAL separate
  * executor JVMs with real task/closure serialization and NO shared
  * statics — and assert bit-identical canonical rows against plain
  * `local` mode.
  *
  * `local[n]` runs tasks in the driver JVM, so a query that leans on
  * process-global state (a static registry, a lazily-initialized codec
  * config, a non-serializable closure capture) passes there forever and
  * dies on its first real cluster. This is the one execution regime the
  * test suite's shared local session cannot testify about; the reference
  * proves the same property by instantiating its semantics suite once
  * per runner (reference: direct vs flink runner test pairs, e.g.
  * beam/core's BeamWindowedStreamDirectTest vs the Flink twin).
  *
  * The slice covers every serialization-sensitive mechanism:
  *   - a custom typed Aggregator (q_reduce_to_latest);
  *   - a codegen'd native Catalyst expression (q_minhash_sig);
  *   - stateful structured streaming + staged commit log (q_integrate_per_key_stream);
  *   - a CachePins swap-pin user (q_lm_score);
  *   - executor-side media decode, incl. MediaCodecs' object init —
  *     headless + ImageIO heap cache — running in the executor JVM (q_media_png);
  *   - the Kafka DSv2 read/write path (q_kafka_updates_range);
  *   - a plain windowed aggregate and the flagship agg (q_window_session, q1_agg).
  *
  * Run (the child needs a Spark distribution for the worker to launch
  * executor JVMs, and the graft classes on the executor classpath):
  * {{{
  * SPARK_HOME=/opt/spark sbt "runMain graft.tools.LocalClusterSmoke /root/testdata/sf0.001"
  * }}}
  * Prints one `SMOKE <query> ... MATCH|DIVERGED` line per query plus a
  * final JSON summary; exits nonzero if any query diverges.
  */
object LocalClusterSmoke {

  /** The default slice. Covers: custom Aggregator, codegen'd expression,
    * stateful streaming + staged logs, CachePins, executor-side media
    * decode, Kafka DSv2 read+write, windowed agg, flagship agg, blob
    * binding, runtime-compiled shell closures, transactional commits,
    * and the observe/ack consumer surface.
    *
    * Deliberately absent: `q_jdbc_updates_range` — EMBEDDED Derby is
    * single-JVM by design, so executor-side partition reads fail LOUDLY
    * with XSDB6 (verified here; a task failure, never silent wrong
    * data). The binding needs a networked database URL on a
    * multi-process cluster — see [[graft.sources.JdbcFamily]]. And
    * `q_widerow_latest_range`, whose sf0.001 result is empty (a
    * vacuous 0 == 0 match proves nothing); its driver-materialized
    * `createDataset` read path is cluster-safe by construction.
    */
  val DefaultQueries: Seq[String] = Seq(
    "q_reduce_to_latest", "q_minhash_sig", "q_integrate_per_key_stream",
    "q_lm_score", "q_media_png", "q_kafka_updates_range",
    "q_window_session", "q1_agg",
    "q_blob_updates_range", "q_shell_closure", "q_txn_commits",
    "q_observe_ack",
    // the round's new codecs run their object init + decode executor-side
    "q_media_adpcm", "q_media_flac",
    // IVF store maintenance: broadcast centroids in the assignment UDF,
    // staged-swap FS ops, quantizer persistence — all executor-sensitive
    "q_ivf_store_append",
    // the WIRE kafka binding: under local-cluster the executor JVMs are
    // separate PROCESSES, so the socket produce (task commit) and the
    // per-split socket fetch here are genuinely cross-process — the
    // claim the in-JVM double could never make (its registry reads
    // empty executor-side, which this smoke originally proved)
    "q_kafka_wire_updates_range")

  /** Deep row renderer: Java arrays (binary columns) toString by
    * identity, which would make equal results compare unequal.
    */
  private[tools] def cell(v: Any): String = v match {
    case a: Array[Byte] => a.map("%02x".format(_)).mkString
    case a: Array[_]    => a.map(cell).mkString("[", ",", "]")
    case s: scala.collection.Seq[_] => s.map(cell).mkString("[", ",", "]")
    case r: org.apache.spark.sql.Row => r.toSeq.map(cell).mkString("(", ",", ")")
    case other          => String.valueOf(other)
  }

  private[tools] def canon(df: DataFrame): Seq[String] = {
    val cols = df.columns.sorted.toSeq
    df.select(cols.map(org.apache.spark.sql.functions.col): _*).collect()
      .map(_.toSeq.map(cell).mkString("|")).sorted.toSeq
  }

  private[tools] def runAll(spark: SparkSession, sfDir: String,
      queries: Seq[String]): Map[String, Seq[String]] =
    queries.map { n =>
      val rows = canon(SparkEntry.queries(n)(spark, sfDir))
      n -> rows
    }.toMap

  private[tools] def stop(spark: SparkSession): Unit = {
    spark.stop()
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val queries =
      if (args.length > 1) args(1).split(",").toSeq else DefaultQueries

    // phase 1: plain local mode — the truth side
    val local = GraftSession.builder("4").getOrCreate()
    local.sparkContext.setLogLevel("WARN")
    val expected = runAll(local, sfDir, queries)
    graft.core.CachePins.releaseAll() // before stop: release unpersists on the live session
    stop(local)
    graft.streaming.EmbeddedKafka.reset() // cluster run must REBUILD its topics

    // phase 2: local-cluster — 2 workers x 2 cores, separate executor
    // JVMs. Executors need the engine classes (extraClassPath) and a
    // Spark distribution (SPARK_HOME or spark.test.home) to launch.
    val cluster = GraftSession.builder("8")
      .master("local-cluster[2,2,2048]")
      .config("spark.executor.memory", "1024m")
      .config("spark.executor.extraClassPath", System.getProperty("java.class.path"))
      // the in-JVM Worker never runs the distribution's load-spark-env.sh,
      // and the launcher's getScalaVersion() refuses to guess without it
      .config("spark.executorEnv.SPARK_SCALA_VERSION", "2.13")
      .getOrCreate()
    cluster.sparkContext.setLogLevel("WARN")
    try {
      var failed = 0
      queries.foreach { n =>
        val got =
          try canon(SparkEntry.queries(n)(cluster, sfDir))
          catch { case e: Exception => Seq(s"<threw ${e.getClass.getName}: ${e.getMessage}>") }
        val exp = expected(n)
        val ok = got == exp
        if (!ok) failed += 1
        println(s"SMOKE $n local=${exp.size} cluster=${got.size} " +
          (if (ok) "MATCH" else "DIVERGED" +
            s" firstDiff=${got.zipAll(exp, "<missing>", "<missing>")
              .find(p => p._1 != p._2).map(p => s"cluster:${p._1.take(120)} local:${p._2.take(120)}")
              .getOrElse("<sizes differ>")}"))
      }
      println(s"""{"smoke":"local-cluster[2,2,2048]","queries":${queries.size},"failed":$failed}""")
      if (failed > 0) sys.exit(1)
    } finally stop(cluster)
  }
}
