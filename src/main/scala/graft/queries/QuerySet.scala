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
private[queries] object StreamSupport {

  def runToMemorySink[T](s: SparkSession,
      stream: org.apache.spark.sql.Dataset[T])(
      drive: org.apache.spark.sql.streaming.StreamingQuery => Unit): DataFrame = {
    val sink = "q_sink_" +
      java.util.UUID.randomUUID().toString.replace("-", "")
    val q = stream.writeStream.format("memory").queryName(sink)
      .outputMode("update").start()
    try drive(q) finally q.stop()
    val out = s.table(sink).localCheckpoint(true)
    s.catalog.dropTempView(sink)
    out
  }
}
