package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One named, oracle-checked query per implemented operator (SURVEY.md §2).
  *
  * Contract (driver): `queries(name)(spark, sfDir)` must produce the same
  * rows — identical column NAMES and values — as `oracles(name)` run by
  * DuckDB over the parquet tables in `sfDir`. Queries without a DuckDB-
  * expressible oracle go in `queries` only (rows-only check).
  *
  * Determinism rules used throughout:
  *  - money/quantity sums as integer cents (`Tables.cents`) — exact at any
  *    parallelism; floating sums are partition-order-dependent;
  *  - averages/ratios rounded to 4 decimals on both sides;
  *  - event time compared as epoch micros (`unix_micros` / duckdb
  *    `epoch_us`) — the events fixture has microsecond precision.
  */
trait QuerySet {
  type QFn = (SparkSession, String) => DataFrame
  def queries: Map[String, QFn]
  def oracles: Map[String, String]
}

/** Shared plumbing for oracle queries that answer through a STREAMING
  * query: run it against a uniquely-named memory sink, then decouple the
  * result from the sink and drop its temp view — a long-lived session
  * (Bench runs every query twice) must not accumulate sink tables
  * pinning every run's rows on the driver.
  */
private[graft] object StreamSupport {

  /** Shape-capture seam: when set, receives each memory-sink query after
    * its drive completes and BEFORE stop() (recentProgress and the last
    * micro-batch's execution are both still attached). The streaming
    * plan-stability goldens read through this; it is never set outside
    * tests.
    */
  @volatile private[graft] var probe:
    Option[org.apache.spark.sql.streaming.StreamingQuery => Unit] = None

  def runToMemorySink[T](s: SparkSession,
      stream: org.apache.spark.sql.Dataset[T])(
      drive: org.apache.spark.sql.streaming.StreamingQuery => Unit): DataFrame = {
    val sink = "q_sink_" +
      java.util.UUID.randomUUID().toString.replace("-", "")
    // the memory-sink view registers in the session that STARTS the query
    // — under StreamConf scoping that is the per-start clone, so the
    // read-back and the drop both go through `qs`, never `s`
    val (q, qs) = graft.streaming.StreamConf.scoped(stream) { ds =>
      (ds.writeStream.format("memory").queryName(sink)
        .outputMode("update").start(), ds.sparkSession)
    }
    // the sink view MUST drop on every exit path: a drive() failure that
    // skipped the drop would leave the q_sink_* table registered with all
    // received rows pinned on the driver — the exact accumulation this
    // helper exists to prevent
    try {
      try { drive(q); probe.foreach(f => f(q)) } finally q.stop()
      qs.table(sink).localCheckpoint(true)
    } finally { qs.catalog.dropTempView(sink); () }
  }
}

/** Scratch commit logs staged ONCE per (session, sf dir, name) and shared
  * by every oracle query that replays them — bench and verify run all
  * queries in one session, and re-staging per query would multiply the
  * scratch writes. A shutdown hook removes the temp dirs, so repeated
  * runs in one session cannot accumulate storage. Keyed by session (not
  * just dir): the family captures its builder's session, and a streaming
  * query must never run against a stale (possibly stopped) one.
  */
private[queries] object StagedLogs {

  /** Per-key build cell: the lazy val gives one-build-wins semantics
    * with a PER-KEY monitor — a global lock would serialize staging of
    * unrelated logs across query sets for the full duration of their
    * Spark jobs.
    */
  private final class Holder(build: () => graft.streaming.CommitLogFamily) {
    lazy val fam: graft.streaming.CommitLogFamily = build()
  }

  private val logs = scala.collection.concurrent.TrieMap
    .empty[(SparkSession, String, String), Holder]
  // successfully-built families only — the shutdown hook must never
  // FORCE an unbuilt holder (that would stage a log during shutdown)
  private val built = scala.collection.concurrent.TrieMap
    .empty[(SparkSession, String, String), graft.streaming.CommitLogFamily]

  locally {
    Runtime.getRuntime.addShutdownHook(new Thread(() =>
      built.values.foreach(f =>
        deleteRecursively(new java.io.File(f.path).getParent))))
  }

  /** The staged log for (s, d, name), building it on first use: `stage`
    * receives a fresh empty family and appends its segments. A failed
    * staging deletes its scratch dir and DEREGISTERS the holder before
    * rethrowing — an orphaned half-written log would never be seen by
    * the shutdown hook (only successful builds register there) and a
    * retry restages fresh.
    */
  def getOrStage(s: SparkSession, d: String, name: String)(
      stage: graft.streaming.CommitLogFamily => Unit): graft.streaming.CommitLogFamily = {
    val key = (s, d, name)
    val h = logs.getOrElseUpdate(key, new Holder(() => {
      val tmp = java.nio.file.Files.createTempDirectory(s"graft-$name").toString
      val fam = new graft.streaming.CommitLogFamily(s, s"$tmp/log")
      try stage(fam)
      catch { case e: Throwable => deleteRecursively(tmp); throw e }
      fam
    }))
    try { val f = h.fam; built.putIfAbsent(key, f); f }
    catch { case e: Throwable => logs.remove(key, h); throw e }
  }

  /** Append each slice as ONE log segment (coalesced to a single file)
    * and stamp every segment's files with strictly increasing
    * modification times. The file streaming source orders files by
    * mtime, and several oracle rows verify batch ORDER itself (the
    * dedup gate's first-occupant, the pane ledger's running counts) —
    * three sub-second appends can land with EQUAL mtimes on a
    * coarse-granularity filesystem, making replay order
    * nondeterministic. 2 s spacing outlasts 1 s mtime granularity;
    * the base sits in the past so later live appends still sort after.
    */
  def appendOrdered(fam: graft.streaming.CommitLogFamily,
      slices: Seq[org.apache.spark.sql.Dataset[graft.core.StreamElement]]): Unit = {
    val dir = new java.io.File(fam.path)
    val base = System.currentTimeMillis() - 3600L * 1000
    var stamped = Set.empty[String]
    slices.zipWithIndex.foreach { case (slice, i) =>
      fam.append(slice.coalesce(1))
      Option(dir.listFiles()).getOrElse(Array.empty[java.io.File])
        .filter(f => f.isFile && !stamped(f.getName))
        .foreach { f =>
          java.nio.file.Files.setLastModifiedTime(f.toPath,
            java.nio.file.attribute.FileTime.fromMillis(base + i * 2000L))
          stamped += f.getName
        }
    }
  }

  def deleteRecursively(dir: String): Unit = {
    import java.nio.file.{Files, Path, Paths}
    val root = Paths.get(dir)
    if (Files.exists(root)) {
      Files.walk(root).sorted(java.util.Comparator.reverseOrder[Path]())
        .forEach(p => { Files.deleteIfExists(p); () })
    }
  }
}

/** Text-metric building blocks shared by TextQueries and RankingQueries —
  * one definition per formula on BOTH sides of the oracle compare (the
  * stopword-ratio arithmetic feeds q_quality_score's hash-verified result
  * AND q_token_budget's selection; copies kept in sync by hand desync
  * silently).
  */
private[queries] object TextMetrics {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.functions.{concat, length, lit, regexp_replace}

  /** Occurrences of `marker` in text, counted via length arithmetic (same
    * formula as the DuckDB oracle — no regex semantics to disagree on).
    */
  def occurrences(c: Column, marker: String): Column =
    ((length(c) - length(regexp_replace(c,
      java.util.regex.Pattern.quote(marker), ""))) / marker.length)
      .cast("long")

  def padded(c: Column): Column = concat(lit(" "), c, lit(" "))

  // the DuckDB mirrors of the same three formulas
  val tokCountSql = "len(regexp_split_to_array(trim(text), '\\s+'))"
  val padSql = "' ' || text || ' '"
  def occSql(expr: String, marker: String): String =
    s"CAST((length($expr) - length(replace($expr, '$marker', ''))) / ${marker.length} AS BIGINT)"
}
