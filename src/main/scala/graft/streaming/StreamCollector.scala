package graft.streaming

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.sql.{DataFrame, Dataset, Row}

/** Console-style bounded `collect()` over an unbounded stream — the
  * reference's lazy console collection with a terminate predicate
  * (reference: BeamStream.collect:581 / forEach:452 with
  * StreamProvider.TerminatePredicate; SURVEY §7 flags this as a hard part).
  *
  * A memory-sink query drains micro-batches until `limit` rows arrived or
  * `timeoutMs` elapsed, then stops the query and returns what was seen —
  * exactly the console contract (Ctrl-C ≈ timeout).
  */
object StreamCollector {

  private val n = new AtomicLong()

  // the memory-sink view registers in the session that STARTS the query —
  // under StreamConf scoping that is the per-start clone, so all reads
  // (and the drop) go through the returned session, never the original
  private def drain(stream: DataFrame, limit: Long,
      timeoutMs: Long): (org.apache.spark.sql.SparkSession, String) = {
    val name = s"collector_${n.incrementAndGet()}"
    val (q, qs) = StreamConf.scoped(stream) { ds =>
      (ds.writeStream.format("memory").queryName(name)
        .outputMode("append").start(), ds.sparkSession)
    }
    try {
      val deadline = System.currentTimeMillis() + timeoutMs
      var done = false
      while (!done && System.currentTimeMillis() < deadline) {
        q.processAllAvailable()
        if (qs.table(name).count() >= limit) done = true
        else Thread.sleep(50)
      }
    } finally q.stop()
    (qs, name)
  }

  // drop the sink view after reading: each drain registers a global
  // memory-sink table holding every drained row on the driver, and an
  // interactive session (GraftShell runs one collect per command) would
  // otherwise accumulate them until OOM
  def collectRows(stream: DataFrame, limit: Long,
      timeoutMs: Long = 30000): Seq[Row] = {
    val (qs, name) = drain(stream, limit, timeoutMs)
    try qs.table(name).limit(limit.toInt).collect().toSeq
    finally qs.catalog.dropTempView(name)
  }

  def collect[T](stream: Dataset[T], limit: Long,
      timeoutMs: Long = 30000): Seq[T] = {
    val (qs, name) = drain(stream.toDF(), limit, timeoutMs)
    try qs.table(name).as[T](stream.encoder)
      .limit(limit.toInt).collect().toSeq
    finally qs.catalog.dropTempView(name)
  }
}
