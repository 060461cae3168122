package graft.examples

import graft.GraftSession
import graft.api._
import graft.sources.Tables

/** End-to-end tour of the fluent API on the driver testdata — the Spark
  * analog of the reference's console walkthrough
  * (reference: docs/src/content/book + tools console; e.g.
  * `env.gateway.status.streamFromOldest().windowAll().countByKey{it.key}.collect()`).
  */
object Demo {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local("4")
    import spark.implicits._
    val sf = args.headOption.getOrElse("/root/testdata/sf0.001")

    // batchUpdates -> filter -> windowAll -> countByKey (SURVEY §3.1 shape)
    val events = Tables.events(spark, sf)
      .select($"event_id", unixMicros($"ts").as("stamp"), $"user_id",
        $"event_type", $"value")
      .as[(Long, Long, Long, String, Double)]
    val s = GStream.of(events).assignEventTime(_._2)

    val counts = s.filter(_._4 != "error")
      .windowAll()
      .countByKey(_._4)
      .collect()
    println(s"countByKey(event_type): ${counts.sortBy(_._2).mkString(", ")}")

    val hourly = s.timeWindow(3600L * 1000 * 1000).sumByKey(_._4, _._5) // stamps are micros
    println(s"hourly sumByKey windows: ${hourly.count()}")

    val sessions = s.sessionWindow(30L * 60 * 1000 * 1000).countByKey(_._3)
    println(s"30min sessions: ${sessions.count()}")

    val running = s.integratePerKey[Long, Double](_._3, _._5, 0.0, _ + _)
    println(s"integratePerKey outputs: ${running.count()}")

    // changelog -> reduceToLatest snapshot (stream-table duality)
    val log = GStream.ofElements(Tables.eventsAsChangelog(spark, sf))
    val snap = log.reduceToLatest()
    println(s"snapshot size: ${snap.count()}")

    // streaming: commit-log family -> continuously-maintained cached view
    val dir = java.nio.file.Files.createTempDirectory("graft-demo-").toString
    val family = new graft.streaming.CommitLogFamily(spark, s"$dir/log")
    family.append(Tables.eventsAsChangelog(spark, sf))
    val view = new graft.streaming.CachedView(family).assign(s"$dir/ckpt")
    view.processAllAvailable()
    println(s"cached view keys: ${view.listEntities(0, 1000).size}")
    println(s"cached view get(user-3): ${
      view.get("user-3", "activity").map(e => new String(e.value, "UTF-8"))}")
    view.stop()

    spark.stop()
  }

  private def unixMicros(c: org.apache.spark.sql.Column) =
    org.apache.spark.sql.functions.unix_micros(c)
}
