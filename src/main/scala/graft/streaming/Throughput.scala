package graft.streaming

import org.apache.spark.sql.Dataset

import graft.core.StreamElement

/** Read-throughput limiting — the reference's ThroughputLimiter surface
  * (reference: core/.../storage/ThroughputLimiter.java:27, impls
  * ...ThroughputLimiter.Pausing/NoOp; applied by log readers via
  * withThroughputLimit).
  *
  * Two surfaces, matching the two read paths:
  *
  *  - Structured Streaming: [[CommitLogFamily.streamFromOldestThrottled]]
  *    bounds ingest per micro-batch via the file source's
  *    `maxFilesPerTrigger` — Spark's native backpressure knob for file
  *    commit logs (the Kafka binding would use `maxOffsetsPerTrigger`).
  *  - Direct consumption (embedded observe loops): a token-bucket
  *    [[RateLimiter]] with injectable clock, plus [[throttled]] to wrap
  *    any element iterator.
  */
object Throughput {

  /** Token bucket: at most `permitsPerSecond` acquisitions per second,
    * with burst capacity of one second's permits. `clock` returns nanos.
    */
  final class RateLimiter(permitsPerSecond: Double, clock: () => Long) {
    require(permitsPerSecond > 0, "permitsPerSecond must be positive")
    private val nanosPerPermit = (1e9 / permitsPerSecond).toLong
    // burst cap: a second's permits, but never below ONE — a sub-1/s
    // rate (e.g. 0.5 = one element per 2 s) must still let the bucket
    // accumulate to a whole permit, else tryAcquire's >= 1.0 threshold
    // is unreachable and acquire() spins forever
    private val burstCap = math.max(permitsPerSecond, 1.0)
    private var available = math.min(permitsPerSecond, burstCap)
    private var lastRefill = clock()

    private def refill(): Unit = {
      val now = clock()
      val gained = (now - lastRefill).toDouble / nanosPerPermit
      if (gained > 0) {
        available = math.min(burstCap, available + gained)
        lastRefill = now
      }
    }

    /** Try to take one permit without blocking. */
    def tryAcquire(): Boolean = synchronized {
      refill()
      if (available >= 1.0) { available -= 1.0; true } else false
    }

    /** Nanos to wait until a permit would be available (0 if now). */
    def nanosUntilAvailable: Long = synchronized {
      refill()
      if (available >= 1.0) 0L
      else ((1.0 - available) * nanosPerPermit).toLong
    }

    /** Blocking acquire (the Pausing limiter's pauseAfterRead). */
    def acquire(): Unit = {
      var done = false
      while (!done) {
        val wait = nanosUntilAvailable
        if (wait > 0) Thread.sleep(wait / 1000000, (wait % 1000000).toInt)
        done = tryAcquire()
      }
    }
  }

  /** Wrap an iterator so each `next()` honors the limiter — the direct
    * observe-loop throttle.
    */
  def throttled[T](it: Iterator[T], limiter: RateLimiter): Iterator[T] =
    new Iterator[T] {
      def hasNext: Boolean = it.hasNext
      def next(): T = { limiter.acquire(); it.next() }
    }
}
