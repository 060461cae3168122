package graft.api

import org.apache.spark.sql.{DataFrame, Dataset, Encoder}
import org.apache.spark.sql.functions._

import graft.core.StreamElement

/** Typed dataflow surface over an UNBOUNDED (streaming) Dataset — the
  * streaming twin of [[GStream]] (reference: the same Stream.java surface
  * runs bounded or unbounded depending on the source;
  * BeamStream.stream/asUnbounded).
  *
  * Element-wise operators are the typed Dataset ops (identical to the
  * batch path). Windowed aggregations lower to the Structured-Streaming-
  * supported shapes — `withWatermark` + `window()`/`session_window()`
  * grouping with partial aggregation — instead of the batch path's
  * `groupByKey`+`mapGroups` (unsupported over streams). Allowed lateness
  * IS the watermark delay, exactly like the batch/streaming agreement the
  * dual-mode suite pins. Custom per-key state machines stay in
  * [[graft.streaming.StateOps]] (flatMapGroupsWithState).
  *
  * Outputs are streaming DataFrames: the caller attaches `writeStream`
  * (append mode emits each window once, when the watermark passes
  * end + lateness).
  */
final class GUnboundedStream[T](val ds: Dataset[T],
    val eventTime: Option[T => Long]) extends Serializable {

  private def requireTime: T => Long = eventTime.getOrElse(
    throw new IllegalStateException(
      "assignEventTime first (windowed ops need event time)"))

  // ---- element-wise (same contract as GStream) ----

  def map[U: Encoder](f: T => U): GUnboundedStream[U] =
    new GUnboundedStream(ds.map(f), None)

  def flatMap[U: Encoder](f: T => IterableOnce[U]): GUnboundedStream[U] =
    new GUnboundedStream(ds.flatMap(f), None)

  def filter(p: T => Boolean): GUnboundedStream[T] =
    new GUnboundedStream(ds.filter(p), eventTime)

  def assignEventTime(f: T => Long): GUnboundedStream[T] =
    new GUnboundedStream(ds, Some(f))

  def union(other: GUnboundedStream[T]): GUnboundedStream[T] =
    new GUnboundedStream(ds.union(other.ds),
      GStream.unionEventTime(eventTime, other.eventTime))

  // ---- windowed aggregations (streaming lowering) ----

  /** (key, value, eventTime) base with the watermark attached; stamp in
    * MICROS (the engine's event-time unit).
    */
  private def keyed[K](keyFn: T => K, valueFn: T => Double,
      latenessMs: Long)(implicit ke: Encoder[(K, Double, Long)]): DataFrame = {
    val et = requireTime
    ds.map(t => (keyFn(t), valueFn(t), et(t)))
      .toDF("key", "value", "stamp_us")
      .withColumn("eventTime", timestamp_micros(col("stamp_us")))
      .withWatermark("eventTime", s"$latenessMs milliseconds")
  }

  private def applyAgg(g: org.apache.spark.sql.RelationalGroupedDataset,
      how: String): DataFrame = how match {
    case "sum"   => g.agg(sum(col("value")).as("agg"))
    case "count" => g.agg(count(lit(1)).cast("double").as("agg"))
    case "avg"   => g.agg(avg(col("value")).as("agg"))
    case "min"   => g.agg(min(col("value")).as("agg"))
    case "max"   => g.agg(max(col("value")).as("agg"))
    case other   => throw new IllegalArgumentException(s"unknown agg: $other")
  }

  /** Tumbling-window aggregate per key: (w_start_us, key, agg). */
  def tumblingAggByKey[K](sizeMs: Long, latenessMs: Long)(
      keyFn: T => K, valueFn: T => Double, how: String = "sum")(implicit
      ke: Encoder[(K, Double, Long)]): DataFrame = {
    val base = keyed(keyFn, valueFn, latenessMs)
    applyAgg(base.groupBy(
      window(col("eventTime"), s"$sizeMs milliseconds"), col("key")), how)
      .select(unix_micros(col("window.start")).as("w_start_us"),
        col("key"), col("agg"))
  }

  /** Sliding-window aggregate per key: (w_start_us, key, agg). */
  def slidingAggByKey[K](sizeMs: Long, slideMs: Long, latenessMs: Long)(
      keyFn: T => K, valueFn: T => Double, how: String = "sum")(implicit
      ke: Encoder[(K, Double, Long)]): DataFrame = {
    val base = keyed(keyFn, valueFn, latenessMs)
    applyAgg(base.groupBy(
      window(col("eventTime"), s"$sizeMs milliseconds",
        s"$slideMs milliseconds"), col("key")), how)
      .select(unix_micros(col("window.start")).as("w_start_us"),
        col("key"), col("agg"))
  }

  /** Gap-merged session aggregate per key (session_window, merged by the
    * streaming state store): (s_start_us, s_end_us, key, agg).
    */
  def sessionAggByKey[K](gapMs: Long, latenessMs: Long)(
      keyFn: T => K, valueFn: T => Double, how: String = "sum")(implicit
      ke: Encoder[(K, Double, Long)]): DataFrame = {
    val base = keyed(keyFn, valueFn, latenessMs)
    applyAgg(base.groupBy(
      session_window(col("eventTime"), s"$gapMs milliseconds"), col("key")), how)
      .select(unix_micros(col("session_window.start")).as("s_start_us"),
        unix_micros(col("session_window.end")).as("s_end_us"),
        col("key"), col("agg"))
  }
}

object GUnboundedStream {

  /** Unbounded view of a commit-log family's changelog, event-timed by
    * `stamp` (micros) — the `asUnbounded` entry point.
    */
  def ofElements(stream: Dataset[StreamElement]): GUnboundedStream[StreamElement] =
    new GUnboundedStream(stream, Some((e: StreamElement) => e.stamp))
}
