package graft.streaming

import scala.collection.concurrent.TrieMap

/** Watermark estimation with pluggable idle policies and a global
  * cross-process tracker — the reference's watermark subsystem
  * (reference: core/.../time/WatermarkEstimator.java:22 — getWatermark:29,
  * update:36, idle:39; direct/core/.../time/
  * BoundedOutOfOrdernessWatermarkEstimator.java:38,
  * ProcessingTimeWatermarkEstimator.java:25,
  * MinimalPartitionWatermarkEstimator.java:31; idle policies
  * SkewedProcessingTimeIdlePolicy.java:31,
  * ProcessingTimeShiftingWatermarkIdlePolicy.java:27,
  * NotProgressingWatermarkIdlePolicy.java:24; global coordination
  * core/.../storage/watermark/GlobalWatermarkTracker.java).
  *
  * Spark's `withWatermark` covers the bounded-out-of-orderness case inside
  * a streaming query; these estimators serve the DIRECT consumption paths
  * (embedded commit-log observe, custom sources) where the caller owns
  * watermark progression — in particular the idle problem: a partition
  * that stops receiving data must not stall the watermark forever.
  *
  * All estimators take an injectable `clock` (millis) so behavior is
  * deterministic under test; pass `System.currentTimeMillis _` in
  * production.
  */
object Watermarks {

  val MinWatermark: Long = Long.MinValue
  val MaxWatermark: Long = Long.MaxValue

  /** Watermark positions flow in millis here (the reference's unit). */
  trait WatermarkEstimator {
    /** Observe an element's event-time stamp. */
    def update(stampMs: Long): Unit
    /** Signal a period with no data (source idle). */
    def idle(): Unit
    def watermark: Long
  }

  /** What the watermark does while the source is idle
    * (WatermarkIdlePolicy.java).
    */
  trait WatermarkIdlePolicy {
    /** Called when the source goes / stays idle; returns the watermark to
      * report given the last data-driven watermark.
      */
    def idleWatermark(lastWatermark: Long): Long
    /** Called on (re)activity so time-shifting policies can re-anchor. */
    def active(): Unit = ()
  }

  /** Watermark does not progress while idle
    * (NotProgressingWatermarkIdlePolicy.java:24).
    */
  final class NotProgressingIdlePolicy extends WatermarkIdlePolicy {
    def idleWatermark(lastWatermark: Long): Long = lastWatermark
  }

  /** Watermark follows processing time minus a fixed skew while idle
    * (SkewedProcessingTimeIdlePolicy.java:31).
    */
  final class SkewedProcessingTimeIdlePolicy(skewMs: Long,
      clock: () => Long) extends WatermarkIdlePolicy {
    def idleWatermark(lastWatermark: Long): Long =
      math.max(lastWatermark, clock() - skewMs)
  }

  /** Watermark advances by the processing time elapsed since the source
    * went idle (ProcessingTimeShiftingWatermarkIdlePolicy.java:27) — keeps
    * event-time cadence without jumping to wall-clock.
    */
  final class ProcessingTimeShiftingIdlePolicy(clock: () => Long)
      extends WatermarkIdlePolicy {
    private var idleSince: Option[(Long, Long)] = None // (clock at idle, wm at idle)
    def idleWatermark(lastWatermark: Long): Long = {
      val (t0, wm0) = idleSince.getOrElse {
        val anchor = (clock(), lastWatermark)
        idleSince = Some(anchor)
        anchor
      }
      wm0 + (clock() - t0)
    }
    override def active(): Unit = idleSince = None
  }

  /** Max-seen-stamp minus allowed skew; idle behavior delegated to the
    * policy (BoundedOutOfOrdernessWatermarkEstimator.java:38, config key
    * max-out-of-orderness:41).
    */
  final class BoundedOutOfOrdernessEstimator(maxOutOfOrdernessMs: Long,
      idlePolicy: WatermarkIdlePolicy = new NotProgressingIdlePolicy)
      extends WatermarkEstimator {
    private var maxSeen: Long = MinWatermark
    private var wm: Long = MinWatermark
    def update(stampMs: Long): Unit = {
      idlePolicy.active()
      if (stampMs > maxSeen) maxSeen = stampMs
      wm = math.max(wm,
        if (maxSeen == MinWatermark) MinWatermark else maxSeen - maxOutOfOrdernessMs)
    }
    def idle(): Unit = wm = math.max(wm, idlePolicy.idleWatermark(wm))
    def watermark: Long = wm
  }

  /** Watermark is simply processing time
    * (ProcessingTimeWatermarkEstimator.java:25).
    */
  final class ProcessingTimeEstimator(clock: () => Long)
      extends WatermarkEstimator {
    def update(stampMs: Long): Unit = ()
    def idle(): Unit = ()
    def watermark: Long = clock()
  }

  /** Min across per-partition estimators — a consumer's overall watermark
    * (MinimalPartitionWatermarkEstimator.java:31).
    */
  final class MinimalPartitionEstimator(
      partitions: Map[Int, WatermarkEstimator]) extends WatermarkEstimator {
    require(partitions.nonEmpty, "need at least one partition")
    def update(stampMs: Long): Unit =
      throw new UnsupportedOperationException("update partitions directly")
    def updatePartition(p: Int, stampMs: Long): Unit = partitions(p).update(stampMs)
    def idlePartition(p: Int): Unit = partitions(p).idle()
    def idle(): Unit = partitions.values.foreach(_.idle())
    def watermark: Long = partitions.values.map(_.watermark).min
  }

  /** Cross-process minimum tracker (GlobalWatermarkTracker.java): each
    * named process reports its watermark; the global watermark is the min
    * over live processes; a finished process stops holding it back.
    */
  final class GlobalWatermarkTracker {
    private val processes = TrieMap.empty[String, Long]
    def update(process: String, watermarkMs: Long): Unit = {
      processes.updateWith(process) {
        case Some(old) => Some(math.max(old, watermarkMs)) // monotonic per process
        case None      => Some(watermarkMs)
      }
      graft.core.Metrics.gauge("graft.watermark.global", globalWatermark)
    }
    def finished(process: String): Unit = processes.remove(process)
    def globalWatermark: Long =
      if (processes.isEmpty) MaxWatermark else processes.values.min
  }

  /** The glue between a consumer's LOCAL estimation and the fleet-wide
    * minimum: an estimator that reports every advance to a global
    * tracker under its process name — how the reference's log readers
    * feed `GlobalWatermarkTracker` (ZKGlobalWatermarkTracker.java:66
    * update path). Works against both tracker flavors via the `report`
    * hook: `new TrackedEstimator("c1", inner, tracker.update)` (in-JVM)
    * or `fileTracker.update` (cross-process). Call the tracker's
    * `finished(process)` when this consumer completes so it stops
    * holding the fleet back.
    */
  final class TrackedEstimator(process: String, inner: WatermarkEstimator,
      report: (String, Long) => Unit) extends WatermarkEstimator {
    private def push(): Unit = report(process, inner.watermark)
    def update(stampMs: Long): Unit = { inner.update(stampMs); push() }
    def idle(): Unit = { inner.idle(); push() }
    def watermark: Long = inner.watermark
  }

  /** CROSS-PROCESS [[GlobalWatermarkTracker]] — the file-backed analog of
    * the reference's ZooKeeper tracker (utils-zookeeper/.../
    * ZKGlobalWatermarkTracker.java:66: per-process znode updates, global
    * min over live processes, session loss evicts a dead process), built
    * on the same storage primitives as [[graft.core.CommitArbiter]]'s
    * marker-file lease instead of a coordination service.
    *
    * Layout: one marker file per (process, value) —
    * `wm.<process>.<value>` under `dir`. The VALUE lives in the file
    * NAME, so an update is one atomic `create` (no content write a
    * reader could see torn, no rename — works identically on POSIX-
    * rename and rename-refusing filesystems); older own markers are
    * deleted after the new one exists, and a reader racing the swap
    * takes the per-process MAX, so it can only read the newer value.
    *
    * Liveness is the ZK-ephemeral analog done with mtimes: a process's
    * newest marker doubles as its heartbeat ([[FileGlobalWatermarkTracker.update]]
    * refreshes mtime even when the value is unchanged), and a process
    * whose newest marker is older than `staleMs` is EVICTED from the
    * global min (and its files reclaimed) — a crashed reporter must not
    * hold the fleet's watermark back forever. Standard lease caveat
    * (CommitArbiter doc): a reporter stalled past `staleMs` can be
    * evicted while alive; its next update re-registers it, and the
    * global watermark may have advanced past it — exactly ZK's
    * session-expiry behavior.
    */
  final class FileGlobalWatermarkTracker(dir: String, staleMs: Long,
      conf: org.apache.hadoop.conf.Configuration =
        new org.apache.hadoop.conf.Configuration(),
      clock: () => Long = System.currentTimeMillis _) {
    import org.apache.hadoop.fs.Path

    require(staleMs > 0, s"staleMs must be positive, got $staleMs")
    private val log = org.slf4j.LoggerFactory.getLogger(getClass)
    private val root = new Path(dir)
    private def fs = root.getFileSystem(conf)

    private def marker(process: String, v: Long) =
      new Path(root, s"wm.$process.$v")

    /** (process, value, mtime) per live marker file. */
    private def markers(): Seq[(String, Long, Long)] = {
      if (!fs.exists(root)) return Seq.empty
      fs.listStatus(root).toSeq.flatMap { st =>
        st.getPath.getName.split('.') match {
          case Array("wm", p, v) => Some((p, v.toLong, st.getModificationTime))
          case _ => None
        }
      }
    }

    /** Report `process`'s watermark (monotonic per process — a lower
      * report only refreshes the heartbeat) and heartbeat its liveness.
      */
    def update(process: String, watermarkMs: Long): Unit = {
      require(!process.contains(".") && process.nonEmpty,
        s"process names must be non-empty and dot-free: '$process'")
      fs.mkdirs(root)
      val own = markers().filter(_._1 == process)
      val current = own.map(_._2).maxOption
      val target = math.max(watermarkMs, current.getOrElse(MinWatermark))
      if (current.contains(target)) {
        // value unchanged: the marker IS the heartbeat — refresh mtime.
        // A concurrent globalWatermark() reader may have just EVICTED
        // this process (deleting the marker between our listing and the
        // setTimes): fall through to re-creation, honoring the documented
        // "its next update re-registers it" stalled-reporter recovery.
        val now = clock()
        try fs.setTimes(marker(process, target), now, now)
        catch {
          case _: java.io.FileNotFoundException =>
            fs.create(marker(process, target), true).close()
        }
      } else {
        val out = fs.create(marker(process, target), false)
        out.close()
        // older own markers die AFTER the new one exists; a racing
        // reader sees both and takes the max
        own.filter(_._2 < target).foreach(m =>
          fs.delete(marker(process, m._2), false))
      }
    }

    /** `process` is done: its watermark stops holding the global back. */
    def finished(process: String): Unit =
      markers().filter(_._1 == process).foreach(m =>
        fs.delete(marker(process, m._2), false))

    /** Min over LIVE processes ([[MaxWatermark]] when none): a process
      * whose newest marker is staler than `staleMs` is evicted — loudly,
      * with its files reclaimed.
      */
    def globalWatermark: Long = {
      val now = clock()
      val byProc = markers().groupBy(_._1)
      val live = byProc.flatMap { case (p, ms) =>
        val newest = ms.maxBy(m => (m._3, m._2))
        if (now - newest._3 > staleMs) {
          log.warn(s"evicting stale watermark process '$p' " +
            s"(${now - newest._3} ms since last heartbeat > $staleMs)")
          ms.foreach(m => fs.delete(marker(p, m._2), false))
          None
        } else Some(ms.map(_._2).max)
      }
      if (live.isEmpty) MaxWatermark else live.min
    }
  }
}
