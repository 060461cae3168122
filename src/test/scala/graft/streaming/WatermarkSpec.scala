package graft.streaming

import java.nio.file.Files

import graft.SparkSpec
import graft.core.StreamElement

/** Watermark estimator / idle policy / global tracker semantics and
  * throughput limiting (reference: the estimator tests under
  * direct/core/.../time, GlobalWatermarkTracker, ThroughputLimiter).
  */
class WatermarkSpec extends SparkSpec {
  import Watermarks._

  test("bounded out-of-orderness: max-seen minus skew, monotonic") {
    val est = new BoundedOutOfOrdernessEstimator(100)
    assert(est.watermark == MinWatermark)
    est.update(1000)
    assert(est.watermark == 900)
    est.update(500) // out-of-order element must not regress the watermark
    assert(est.watermark == 900)
    est.update(2000)
    assert(est.watermark == 1900)
  }

  test("not-progressing idle policy holds the watermark") {
    val est = new BoundedOutOfOrdernessEstimator(100,
      new NotProgressingIdlePolicy)
    est.update(1000)
    est.idle(); est.idle()
    assert(est.watermark == 900)
  }

  test("skewed processing-time idle policy follows the clock minus skew") {
    var now = 10000L
    val est = new BoundedOutOfOrdernessEstimator(100,
      new SkewedProcessingTimeIdlePolicy(500, () => now))
    est.update(1000)
    assert(est.watermark == 900)
    est.idle()
    assert(est.watermark == 9500) // clock 10000 - skew 500
    now = 20000L
    est.idle()
    assert(est.watermark == 19500)
    // new data re-anchors on event time again (monotonic, no regression)
    est.update(30000)
    assert(est.watermark == 29900)
  }

  test("processing-time shifting idle policy advances by elapsed idle time") {
    var now = 10000L
    val est = new BoundedOutOfOrdernessEstimator(100,
      new ProcessingTimeShiftingIdlePolicy(() => now))
    est.update(1000)
    assert(est.watermark == 900)
    est.idle() // anchors at (clock=10000, wm=900)
    assert(est.watermark == 900)
    now = 10250L
    est.idle()
    assert(est.watermark == 1150) // 900 + 250 elapsed
    now = 10400L
    est.idle()
    assert(est.watermark == 1300)
    // activity resets the anchor
    est.update(5000)
    assert(est.watermark == 4900)
  }

  test("minimal partition estimator takes the min; idle partitions release it") {
    var now = 50000L
    val parts = Map(
      0 -> new BoundedOutOfOrdernessEstimator(0,
        new SkewedProcessingTimeIdlePolicy(1000, () => now)),
      1 -> new BoundedOutOfOrdernessEstimator(0,
        new SkewedProcessingTimeIdlePolicy(1000, () => now)))
    val est = new MinimalPartitionEstimator(
      parts.view.mapValues(_.asInstanceOf[WatermarkEstimator]).toMap)
    est.updatePartition(0, 10000)
    est.updatePartition(1, 4000)
    assert(est.watermark == 4000) // held back by the slow partition
    // the slow partition goes idle -> skewed policy un-stalls the min
    est.idlePartition(1)
    assert(est.watermark == 10000) // min(10000, 49000)
  }

  test("global tracker: min over live processes, finished releases, monotonic per process") {
    val t = new GlobalWatermarkTracker
    assert(t.globalWatermark == MaxWatermark)
    t.update("p1", 100); t.update("p2", 50)
    assert(t.globalWatermark == 50)
    t.update("p2", 40) // regression ignored (monotonic per process)
    assert(t.globalWatermark == 50)
    t.update("p2", 200)
    assert(t.globalWatermark == 100)
    t.finished("p1")
    assert(t.globalWatermark == 200)
  }

  test("rate limiter: token bucket with deterministic clock") {
    var nanos = 0L
    val rl = new Throughput.RateLimiter(10, () => nanos) // 10/s, burst 10
    assert((1 to 10).forall(_ => rl.tryAcquire()))
    assert(!rl.tryAcquire(), "burst exhausted")
    assert(rl.nanosUntilAvailable == 100000000L) // 0.1s per permit
    nanos += 100000000L
    assert(rl.tryAcquire())
    assert(!rl.tryAcquire())
    nanos += 1000000000L // a full second refills the whole burst
    assert((1 to 10).forall(_ => rl.tryAcquire()))
    assert(!rl.tryAcquire())
  }

  test("throttled stream read: maxFilesPerTrigger bounds each micro-batch") {
    val fam = new CommitLogFamily(spark,
      Files.createTempDirectory("graft-throttle-").toString + "/log")
    def up(i: Int) = StreamElement("e", s"k$i", "a", s"u$i", 0, i.toLong,
      Array[Byte](1), delete = false, deleteWildcard = false)
    // three appends -> three log segments
    fam.append(Seq(up(1))); fam.append(Seq(up(2))); fam.append(Seq(up(3)))
    val q = fam.streamFromOldestThrottled(maxFilesPerTrigger = 1)
      .writeStream.format("memory").queryName("throttled")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      assert(spark.sql("SELECT * FROM throttled").count() == 3)
      val dataBatches = q.recentProgress.count(_.numInputRows > 0)
      assert(dataBatches >= 3,
        s"1 file per trigger over 3 segments needs >= 3 data batches, got $dataBatches")
    } finally q.stop()
  }

  test("file-backed global tracker: per-process monotonic min, finished " +
      "release, MaxWatermark when empty (ZKGlobalWatermarkTracker laws)") {
    val dir = Files.createTempDirectory("graft-wm-").toString
    val t = new FileGlobalWatermarkTracker(dir, staleMs = 60000)
    assert(t.globalWatermark == MaxWatermark)
    t.update("a", 100)
    t.update("b", 50)
    assert(t.globalWatermark == 50)
    // per-process monotonic: a LOWER report refreshes liveness only
    t.update("b", 20)
    assert(t.globalWatermark == 50)
    t.update("b", 150)
    assert(t.globalWatermark == 100, "a now holds the min")
    t.finished("a")
    assert(t.globalWatermark == 150)
    t.finished("b")
    assert(t.globalWatermark == MaxWatermark)
  }

  test("file-backed global tracker: a process with no heartbeat past " +
      "staleMs is evicted and reclaimed; an update re-registers it") {
    val dir = Files.createTempDirectory("graft-wm-stale-").toString
    val t = new FileGlobalWatermarkTracker(dir, staleMs = 5000)
    t.update("dead", 10)
    t.update("live", 500)
    // backdate the dead process's marker past the lease
    val files = new java.io.File(dir).listFiles()
      .filter(_.getName.startsWith("wm.dead."))
    assert(files.length == 1)
    assert(files.head.setLastModified(System.currentTimeMillis() - 60000))
    assert(t.globalWatermark == 500, "stale process must not hold the min")
    assert(!new java.io.File(dir).listFiles()
        .exists(_.getName.startsWith("wm.dead.")),
      "eviction reclaims the stale process's markers")
    // ZK session-expiry analog: the next update re-registers from scratch
    t.update("dead", 30)
    assert(t.globalWatermark == 30)
  }

  test("a heartbeat racing a concurrent eviction RE-REGISTERS instead of " +
      "crashing (marker deleted between listing and setTimes)") {
    val dir = Files.createTempDirectory("graft-wm-evictrace-").toString
    // the unchanged-value branch calls clock() AFTER listing its own
    // marker and BEFORE the mtime refresh — inject the racing reader's
    // eviction exactly there (pre-fix: FileNotFoundException from
    // fs.setTimes)
    @volatile var evictOnTick = false
    val clock = () => {
      if (evictOnTick) {
        evictOnTick = false
        new java.io.File(dir).listFiles()
          .filter(_.getName.startsWith("wm.p.")).foreach(f => f.delete())
      }
      System.currentTimeMillis()
    }
    val t = new FileGlobalWatermarkTracker(dir, staleMs = 60000,
      clock = clock)
    t.update("p", 100)
    evictOnTick = true
    t.update("p", 100) // heartbeat: listing saw the marker, then it died
    assert(new java.io.File(dir).listFiles()
        .exists(_.getName == "wm.p.100"),
      "the evicted process re-registered its marker")
    assert(t.globalWatermark == 100)
  }

  test("a consumer fleet's estimators feed the global tracker: the " +
      "global min tracks the slowest consumer, finish releases it") {
    val dir = Files.createTempDirectory("graft-wm-fleet-").toString
    val tracker = new FileGlobalWatermarkTracker(dir, staleMs = 60000)
    // two consumers of one topic, each running the reference's default
    // estimator locally and reporting through the glue
    // one partition => poll order is append order (stamps ascending)
    val t = EmbeddedKafka.topic("wm-fleet", "t", 1)
    (1 to 6).foreach(i => t.append(StreamElement("gw", s"k$i", "a",
      s"u$i", 0, 1000L * i, Array[Byte](1), delete = false,
      deleteWildcard = false)))
    def consumer(name: String): (EmbeddedKafka.Consumer, TrackedEstimator) =
      (new EmbeddedKafka.Consumer(t, name),
        new TrackedEstimator(name,
          new BoundedOutOfOrdernessEstimator(100), tracker.update))
    val (c1, e1) = consumer("c1")
    val (_, e2) = consumer("c2")
    // c1 processes everything; c2 stalls after the first two records
    c1.pollUncommitted().foreach(r => e1.update(r.element.stamp))
    val polled = new EmbeddedKafka.Consumer(t, "c2-g").pollUncommitted()
    polled.take(2).foreach(r => e2.update(r.element.stamp))
    assert(e1.watermark == 5900 && e2.watermark == 1900)
    assert(tracker.globalWatermark == 1900,
      "the fleet watermark is the SLOWEST consumer's")
    // the stalled consumer finishing releases the global to the leader
    tracker.finished("c2")
    assert(tracker.globalWatermark == 5900)
    tracker.finished("c1")
    assert(tracker.globalWatermark == MaxWatermark)
  }

  test("file-backed global tracker coordinates across PROCESSES (child " +
      "JVMs reporting through the shared directory)") {
    import scala.sys.process.{Process, ProcessLogger}
    val dir = Files.createTempDirectory("graft-wm-xproc-").toString
    val t = new FileGlobalWatermarkTracker(dir, staleMs = 60000)
    def child(args: String*): String = {
      val out = new StringBuilder
      val cmd = Seq(graft.tools.ChildJvm.javaBin, "-cp",
        System.getProperty("java.class.path"),
        "graft.tools.WatermarkSmoke") ++ args
      val rc = Process(cmd).!(ProcessLogger(
        l => out.synchronized { out.append(l).append('\n') }, _ => ()))
      assert(rc == 0, s"child ${args.mkString(" ")} failed:\n$out")
      out.synchronized { out.toString }
    }
    child("report", dir, "60000", "consumerA", "100")
    child("report", dir, "60000", "consumerB", "50")
    assert(t.globalWatermark == 50, "parent reads both children's reports")
    // monotonicity holds ACROSS process restarts: a restarted consumerB
    // reporting lower must not regress its stored watermark
    val o = child("report", dir, "60000", "consumerB", "150,60")
    assert(o.linesIterator.toSeq.last.endsWith("global=100"),
      s"child must read the cross-process min (A=100):\n$o")
    assert(t.globalWatermark == 100)
    child("finish", dir, "60000", "consumerA")
    assert(t.globalWatermark == 150,
      "a finished process releases the global watermark")
  }

  test("TrackedEstimator end-to-end: two streaming-query PROCESSES feed " +
      "the shared tracker from inside their micro-batch loops, and the " +
      "global min GATES a downstream emit until the slowest catches up") {
    import scala.sys.process.{Process, ProcessLogger}
    val dir = Files.createTempDirectory("graft-wm-e2e-").toString
    val scratch = Files.createTempDirectory("graft-wm-e2e-logs-")
    val tracker = new FileGlobalWatermarkTracker(dir, staleMs = 600000)
    def child(args: String*): String = {
      val out = new StringBuilder
      val cmd = Seq(graft.tools.ChildJvm.javaBin) ++
        graft.tools.ChildJvm.addOpens ++ Seq(
        "-Xmx2g", "-Dspark.ui.enabled=false",
        "-cp", System.getProperty("java.class.path"),
        "graft.tools.WatermarkSmoke") ++ args
      val rc = Process(cmd).!(ProcessLogger(
        l => out.synchronized { out.append(l).append('\n') }, _ => ()))
      assert(rc == 0, s"child ${args.mkString(" ")} failed:\n$out")
      out.synchronized { out.toString }
    }
    val H = 3600L * 1000000 // 1h in stamp units (µs)
    def el(stamp: Long) = StreamElement("gw", s"k$stamp", "a", s"u$stamp",
      0, stamp, Array[Byte](1), delete = false, deleteWildcard = false)
    val famA = new CommitLogFamily(spark, s"$scratch/logA")
    val famB = new CommitLogFamily(spark, s"$scratch/logB")
    // consumer A's log reaches window 3; consumer B starts with only its
    // first segment (max stamp just past window 0's end)
    famA.append(Seq(el(H + 5), el(2 * H + 5), el(3 * H + 5)))
    famB.append(Seq(el(5), el(H + 50)))
    child("consume", dir, "600000", "procA", s"$scratch/logA", s"$scratch/cpA")
    val b1 = child("consume", dir, "600000", "procB", s"$scratch/logB",
      s"$scratch/cpB")
    assert(b1.contains("consumed"), b1)
    // the fleet watermark is the SLOWEST streaming consumer's estimate
    assert(tracker.globalWatermark == H + 50,
      s"global must be B's max stamp: ${tracker.globalWatermark}")
    // downstream emit gate: an hourly window emits only once the GLOBAL
    // min passes its end — with B stalled at H+50, only window 0 is due
    def readyWindows(): Seq[Long] = {
      val stamps = famA.batchUpdates().collect() ++ famB.batchUpdates().collect()
      stamps.map(_.stamp / H).distinct.sorted.toSeq
        .filter(w => (w + 1) * H <= tracker.globalWatermark)
    }
    assert(readyWindows() == Seq(0L),
      "only window 0 may emit while the slowest consumer sits at H+50")
    // B catches up: new segment lands, the RESTARTED consumer process
    // resumes from its checkpoint (only the new file replays) and its
    // in-loop estimator report advances the global
    famB.append(Seq(el(2 * H + 9), el(3 * H + 7)))
    val b2 = child("consume", dir, "600000", "procB", s"$scratch/logB",
      s"$scratch/cpB")
    assert(!b2.contains("batch=0 "),
      s"restart must resume from the checkpoint, not replay batch 0:\n$b2")
    assert(tracker.globalWatermark == 3 * H + 5,
      s"global must rise to A's report: ${tracker.globalWatermark}")
    assert(readyWindows() == Seq(0L, 1L, 2L),
      "windows 1 and 2 emit once the slowest consumer passes their ends " +
        "(window 3 stays open: no watermark has passed 4H)")
    child("finish", dir, "600000", "procA")
    child("finish", dir, "600000", "procB")
    assert(tracker.globalWatermark == MaxWatermark)
  }
}
