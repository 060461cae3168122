package graft.core

import java.nio.file.Files

import graft.SparkSpec
import graft.SparkSpec.spark.implicits._
import graft.streaming.CommitLogFamily

/** The metrics surface: counters from driver-side wire-ins (appends,
  * transactions, lookups), observe()-harvested executor-side counts
  * (dropped buckets), gauges (global watermark) and the pluggable
  * listener — the reference's metrics contract
  * (core/.../metrics/Metrics.java) on Spark mechanisms.
  */
class MetricsSpec extends SparkSpec {

  private def up(key: String, attr: String, stamp: Long, v: String) =
    StreamElement("user", key, attr, s"u-$key-$attr-$stamp", 0, stamp,
      v.getBytes("UTF-8"), delete = false, deleteWildcard = false)

  test("appends, lookups and transaction outcomes count; listener fires") {
    Metrics.reset()
    val heard = collection.mutable.ArrayBuffer.empty[(String, Long)]
    val l = new Metrics.Listener {
      override def onCounter(name: String, delta: Long, total: Long): Unit =
        heard.synchronized { heard += ((name, delta)) }
    }
    Metrics.addListener(l)
    try {
      val fam = new CommitLogFamily(spark,
        Files.createTempDirectory("graft-metrics-").toString + "/log")
      fam.append(Seq(up("u1", "a", 1, "x"), up("u2", "a", 2, "y")))
      assert(Metrics.counter("graft.elements.appended") == 2)

      new graft.randomaccess.RandomAccessReader(fam).get("u1", "a")
      assert(Metrics.counter("graft.randomaccess.lookups") == 1)

      val coord = new TransactionCoordinator(fam)
      val t1 = coord.begin(); val t2 = coord.begin()
      t1.update(up("u1", "a", 3, "new")); t1.commit()
      t2.update(up("u1", "a", 4, "lost"))
      intercept[coord.TransactionRejectedException](t2.commit())
      assert(Metrics.counter("graft.transactions.committed") == 1)
      assert(Metrics.counter("graft.transactions.rejected") == 1)

      assert(heard.synchronized(heard.exists(_._1 == "graft.elements.appended")))
    } finally Metrics.removeListener(l)
  }

  test("observe harvest: consuming the quarantine side counts drops") {
    Metrics.reset()
    Metrics.install(spark)
    val docs = (1 to 50).map(i => (i.toLong, "same text in every doc always"))
      .toDF("doc_id", "text")
    val sig = graft.functions.MinHashLsh.signature(docs, "text", 3, 8)
    val drops = graft.functions.MinHashLsh
      .lshCandidatesWithDrops(sig, 8, 2, maxBucket = 10).droppedBuckets
    assert(drops.count() == 4) // 4 bands, one oversized bucket each
    // the QueryExecutionListener fires asynchronously after the action
    val deadline = System.currentTimeMillis() + 20000
    while (Metrics.counter("graft.buckets.dropped") < 4 &&
        System.currentTimeMillis() < deadline) Thread.sleep(50)
    assert(Metrics.counter("graft.buckets.dropped") == 4)
    assert(Metrics.counter("graft.buckets.droppedMembers") == 200) // 4 x 50
  }

  test("watermark gauge tracks the global minimum") {
    Metrics.reset()
    val tracker = new graft.streaming.Watermarks.GlobalWatermarkTracker
    tracker.update("p1", 1000)
    tracker.update("p2", 500)
    assert(Metrics.gaugeValue("graft.watermark.global").contains(500))
    tracker.update("p2", 2000)
    assert(Metrics.gaugeValue("graft.watermark.global").contains(1000))
  }
}
