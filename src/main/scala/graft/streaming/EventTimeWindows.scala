package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, Trigger}

import graft.core.StreamElement

/** Event-time windowed aggregation for unbounded changelogs: watermarks,
  * allowed lateness, early emitting, late-data split — the reference's
  * WindowedStream streaming knobs
  * (reference: WindowedStream.withAllowedLateness:539 /
  * withEarlyEmitting:531; watermark estimator
  * BoundedOutOfOrdernessWatermarkEstimator.java:38; late split
  * beam/core/.../transforms/FilterLatecomers.java:42).
  *
  * Mapping: allowed lateness == the watermark delay (`withWatermark`) —
  * Spark finalizes a window once the watermark passes its end, exactly the
  * reference's lateness bound; early emitting == a processing-time trigger
  * with update output mode (partial per-window results on a cadence).
  */
object EventTimeWindows {

  /** Watermarked event-time view of a changelog. `stampUnit` defaults to
    * micros — the unit this repo's events-derived changelogs stamp in —
    * and routes through the one shared unit mapping
    * ([[StateOps.stampTimestamp]]), so a millis-stamped log passes
    * "millis" instead of silently getting windows 1000x off.
    */
  def withEventTime(stream: Dataset[StreamElement],
      allowedLatenessMs: Long, stampUnit: String = "micros"): DataFrame =
    stream
      .withColumn("eventTime", StateOps.stampTimestamp("stamp", stampUnit))
      .withWatermark("eventTime", s"$allowedLatenessMs milliseconds")

  /** Tumbling-window counts per key; with append output mode a window is
    * emitted once, when the watermark passes end+lateness — late elements
    * beyond the bound are dropped (the reference's lateness contract).
    */
  def tumblingCounts(stream: Dataset[StreamElement], sizeMs: Long,
      allowedLatenessMs: Long, stampUnit: String = "micros"): DataFrame =
    withEventTime(stream, allowedLatenessMs, stampUnit)
      .groupBy(window(col("eventTime"), s"$sizeMs milliseconds"), col("key"))
      .agg(count(lit(1)).as("n"))
      .select(unix_micros(col("window.start")).as("w_start_us"), col("key"),
        col("n"))

  /** Early emitting: periodic partial results inside open windows
    * (WindowedStream.withEarlyEmitting → processing-time trigger + update
    * mode, BeamWindowedStream.java:598).
    */
  def withEarlyEmitting[T](writer: DataStreamWriter[T],
      intervalMs: Long): DataStreamWriter[T] =
    writer.trigger(Trigger.ProcessingTime(intervalMs)).outputMode("update")

  /** Late-data split for bounded replays (FilterLatecomers.getOnTime:52 /
    * getLate:57): given the watermark position each element was observed
    * at, split on-time vs late. In streaming Spark performs the drop inside
    * the stateful operator; this is the batch/audit analog used to measure
    * lateness.
    */
  def splitLate(ds: Dataset[StreamElement], watermarkStamp: Long,
      allowedLatenessMs: Long, stampUnit: String = "micros")
      : (Dataset[StreamElement], Dataset[StreamElement]) = {
    val bound = watermarkStamp -
      allowedLatenessMs * StateOps.stampDivisor(stampUnit)
    (ds.filter(col("stamp") >= bound).as[StreamElement](StreamElement.encoder),
      ds.filter(col("stamp") < bound).as[StreamElement](StreamElement.encoder))
  }

  /** Shift a changelog's event time (WatermarkShift.java:43 /
    * AssignEventTime.java:27).
    */
  def shiftEventTime(ds: Dataset[StreamElement], byMs: Long,
      stampUnit: String = "micros"): Dataset[StreamElement] = {
    implicit val enc = StreamElement.encoder
    val mul = StateOps.stampDivisor(stampUnit)
    ds.map(e => e.copy(stamp = e.stamp + byMs * mul))
  }
}
