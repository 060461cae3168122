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
}
