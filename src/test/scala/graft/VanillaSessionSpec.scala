package graft

import org.apache.spark.sql.SparkSession

/** Driver-shaped CI gate: EVERY declared query must execute on a session
  * that did NOT go through [[GraftSession]] — no nanos-as-long parquet
  * setting, no UTC session timezone, default shuffle partitions. Round 7's
  * testdata regeneration broke 30 queries while 276 tests stayed green,
  * because every test shared GraftSession's confs; this spec makes that
  * class of drift red in CI (VERDICT r7 §Next #4).
  *
  * Two laws:
  *  1. liveness — each query plans and executes on the vanilla session;
  *  2. session-independence — timestamp-carrying queries return the SAME
  *     rows under a non-UTC session timezone as under GraftSession's UTC
  *     (the events `ts` normalization must be TZ-deterministic, not an
  *     accident of `spark.sql.session.timeZone`).
  */
class VanillaSessionSpec extends SparkSpec {

  private def vanilla(): SparkSession = {
    val v = spark.newSession()
    // strip everything GraftSession.builder sets that could mask drift
    v.conf.unset("spark.sql.legacy.parquet.nanosAsLong")
    v.conf.set("spark.sql.session.timeZone", "America/Chicago")
    v.conf.set("spark.sql.shuffle.partitions", "8")
    v
  }

  private val sf = "/root/testdata/sf0.001"

  test("every declared query executes on a vanilla non-UTC session") {
    val v = vanilla()
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        try { fn(v, sf).count(); v.catalog.clearCache(); None }
        catch { case e: Throwable =>
          v.catalog.clearCache()
          Some(s"$name: ${Option(e.getMessage).getOrElse(e.getClass.getName).linesIterator.take(2).mkString(" / ")}")
        }
    }
    assert(failures.isEmpty,
      s"${failures.size} queries fail on a vanilla session:\n${failures.mkString("\n")}")
  }

  test("ts-carrying queries are session-timezone independent") {
    // representative per ts-consumption shape: raw unix_micros changelog,
    // NTZ-column predicate, tumbling/sliding/session event-time windows,
    // calendar window, snapshot compaction
    val pinned = Seq("q_batch_updates_range", "q1_agg", "q_window_tumbling",
      "q_window_sliding", "q_window_session", "q_window_calendar_month",
      "q_snapshot_compaction")
    val v = vanilla()
    pinned.foreach { name =>
      val fn = SparkEntry.queries(name)
      val utc = fn(spark, sf).collect().map(_.toString).sorted.toSeq
      val ctz = fn(v, sf).collect().map(_.toString).sorted.toSeq
      assert(utc == ctz,
        s"$name differs between UTC and America/Chicago sessions " +
          s"(${utc.size} vs ${ctz.size} rows; first diff: " +
          s"${utc.zip(ctz).find(p => p._1 != p._2)})")
      v.catalog.clearCache()
      spark.catalog.clearCache()
    }
  }
}
