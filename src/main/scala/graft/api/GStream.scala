package graft.api

import org.apache.spark.sql.{Dataset, Encoder, Encoders}

import graft.core.StreamElement

/** The engine's fluent dataflow surface — typed Scala analog of the
  * reference's Stream (reference: tools/src/main/java/cz/o2/proxima/tools/
  * groovy/Stream.java:34; Beam impl beam/tools/.../BeamStream.java:163).
  * Groovy closures become Scala lambdas; the lazy PCollectionProvider
  * becomes Spark's lazy Dataset lineage — a terminal op (`collect`) triggers
  * the job exactly as the reference's `collect()` materializes the pipeline
  * (BeamStream.java:581).
  *
  * `eventTime` carries the element → event-time extractor (the reference
  * keeps event time implicit on StreamElement and reassigns it with
  * `assignEventTime`, Stream.java:115); windowed/stateful operators require
  * it.
  *
  * Scale notes: typed lambdas opt out of Catalyst expression optimization —
  * exactly like the reference's user closures — but the *shape* (shuffle
  * placement, partial aggregation, sort-within-partitions for time-sorted
  * state) is chosen for 1000-executor behavior; see GWindowedStream and the
  * keyed-state ops below. Column-based equivalents used by SparkEntry
  * queries keep hot paths in whole-stage codegen.
  */
final class GStream[T](val ds: Dataset[T], val eventTime: Option[T => Long])
    extends Serializable {

  private def spark = ds.sparkSession

  // ---- element-wise (Stream.java:43-107) ----

  def map[U: Encoder](f: T => U): GStream[U] =
    new GStream(ds.map(f), None)

  def flatMap[U: Encoder](f: T => IterableOnce[U]): GStream[U] =
    new GStream(ds.flatMap(f), None)

  def filter(p: T => Boolean): GStream[T] =
    new GStream(ds.filter(p), eventTime)

  /** Reassign event time (Stream.assignEventTime, Stream.java:115). */
  def assignEventTime(f: T => Long): GStream[T] =
    new GStream(ds, Some(f))

  /** Pair each element with its event-time (Stream.withTimestamp,
    * Stream.java:154).
    */
  def withTimestamp(implicit e: Encoder[(T, Long)]): GStream[(T, Long)] = {
    val et = requireTime
    new GStream(ds.map(t => (t, et(t))), Some((p: (T, Long)) => p._2))
  }

  /** union (Stream.union, Stream.java:337). Event time survives only when
    * BOTH sides agree (same extractor instance, or neither assigned) —
    * silently applying the left side's extractor to right-side elements
    * windowed them by the wrong field with no error.
    */
  def union(other: GStream[T]): GStream[T] =
    new GStream(ds.union(other.ds),
      GStream.unionEventTime(eventTime, other.eventTime))

  /** Break lineage fusion / redistribute (Stream.reshuffle, Stream.java:552). */
  def reshuffle(partitions: Int): GStream[T] =
    new GStream(ds.repartition(partitions), eventTime)

  // ---- windowing (Stream.java:291-329) ----

  def timeWindow(sizeMs: Long): GWindowedStream[T] =
    windowed(FixedWindows(sizeMs))

  def timeSlidingWindow(sizeMs: Long, slideMs: Long): GWindowedStream[T] =
    windowed(SlidingWindows(sizeMs, slideMs))

  /** Per-key gap sessions (Stream.sessionWindow, Stream.java:310) — the key
    * is supplied to the aggregation op, as in the reference.
    */
  def sessionWindow(gapMs: Long): GWindowedStream[T] =
    windowed(SessionWindows(gapMs))

  /** Calendar windows are unit-bound (unlike the proportional windowings):
    * pass stampUnit = "micros" when the assigned event time is the engine's
    * micros stamps (e.g. [[GStream.ofElements]]).
    */
  def calendarWindow(unit: String, count: Int, tz: String,
      stampUnit: String = "millis"): GWindowedStream[T] =
    windowed(CalendarWindows(unit, count, tz, stampUnit))

  def windowAll(): GWindowedStream[T] = windowed(GlobalWindowing)

  private def windowed(w: Windowing): GWindowedStream[T] =
    new GWindowedStream(this, w)

  // ---- keyed state (Stream.java:386-550) ----

  /** Running prefix-combine per key, one output per input, event-time order
    * (Stream.integratePerKey, Stream.java:520; Beam IntegrateDoFn
    * BeamStream.java:1498 with @RequiresTimeSortedInput).
    *
    * Spark lowering: repartition by key + sortWithinPartitions(key, stamp) +
    * mapPartitions scan — the distributed analog of time-sorted keyed state
    * with NO per-key buffering, so a key with 10^9 elements streams through
    * (spill-safe external sort), unlike a naive groupByKey.
    */
  def integratePerKey[K, V](keyFn: T => K, valueFn: T => V, initial: V,
      combine: (V, V) => V)(implicit
      ke: Encoder[K], tupe: Encoder[(K, Long, V)],
      oute: Encoder[(K, V)]): GStream[(K, V)] = {
    val out = timeSortedScan[K, V, (K, V)](keyFn, valueFn, sortByStamp = true) { it =>
      var curKey: Option[K] = None
      var acc: V = initial
      it.map { case (k, _, v) =>
        // deepEquals, not ==: Array keys compare by REFERENCE under ==,
        // and each deserialized row yields a fresh array — the
        // accumulator would silently reset on every element
        if (!curKey.exists(ck => java.util.Objects.deepEquals(ck, k))) {
          curKey = Some(k); acc = initial
        }
        acc = combine(acc, v)
        (k, acc)
      }
    }
    new GStream(out, None)
  }

  /** [[integratePerKey]] carrying each element's event time through to the
    * output (key, runningValue, stamp), with the result stream's event time
    * pre-assigned to that stamp. The reference keeps timestamps implicitly
    * on every element (Beam), so its stateful ops CHAIN — GroovyEnvTest
    * .testReduceValueWithIntegratePerKey:749 pipes reduceValueStateByKey
    * into integratePerKey into withTimestamp; this is the engine's explicit
    * form of that timestamp propagation.
    */
  def integratePerKeyTimed[K, V](keyFn: T => K, valueFn: T => V, initial: V,
      combine: (V, V) => V)(implicit
      ke: Encoder[K], tupe: Encoder[(K, Long, V)],
      oute: Encoder[(K, V, Long)]): GStream[(K, V, Long)] = {
    val out = timeSortedScan[K, V, (K, V, Long)](keyFn, valueFn, sortByStamp = true) { it =>
      var curKey: Option[K] = None
      var acc: V = initial
      it.map { case (k, stamp, v) =>
        if (!curKey.exists(ck => java.util.Objects.deepEquals(ck, k))) {
          curKey = Some(k); acc = initial
        }
        acc = combine(acc, v)
        (k, acc, stamp)
      }
    }
    new GStream(out, Some((x: (K, V, Long)) => x._3))
  }

  /** General keyed state machine: per element emit `output(state, v)` then
    * `state = update(state, v)`; event-time-sorted variant
    * (Stream.reduceValueStateByKey, Stream.java:386; Beam DoFns
    * BeamStream.java:1544-1700). Same sort-within-partitions lowering as
    * integratePerKey.
    */
  def reduceValueStateByKey[K, V, S, O](keyFn: T => K, valueFn: T => V,
      initialState: S, output: (S, V) => O, update: (S, V) => S,
      sorted: Boolean = true)(implicit
      ke: Encoder[K], tupe: Encoder[(K, Long, V)],
      oute: Encoder[(K, O)]): GStream[(K, O)] = {
    val out = timeSortedScan[K, V, (K, O)](keyFn, valueFn, sortByStamp = sorted) { it =>
      var curKey: Option[K] = None
      var state: S = initialState
      it.map { case (k, _, v) =>
        // deepEquals: see integratePerKey — Array keys reset per row under ==
        if (!curKey.exists(ck => java.util.Objects.deepEquals(ck, k))) {
          curKey = Some(k); state = initialState
        }
        val o = output(state, v)
        state = update(state, v)
        (k, o)
      }
    }
    new GStream(out, None)
  }

  /** [[reduceValueStateByKey]] (sorted form) carrying each element's event
    * time through to the output (key, output, stamp) — see
    * [[integratePerKeyTimed]] for why timestamp propagation matters when
    * chaining stateful ops (GroovyEnvTest:749, :910).
    */
  def reduceValueStateByKeyTimed[K, V, S, O](keyFn: T => K, valueFn: T => V,
      initialState: S, output: (S, V) => O, update: (S, V) => S)(implicit
      ke: Encoder[K], tupe: Encoder[(K, Long, V)],
      oute: Encoder[(K, O, Long)]): GStream[(K, O, Long)] = {
    val out = timeSortedScan[K, V, (K, O, Long)](keyFn, valueFn, sortByStamp = true) { it =>
      var curKey: Option[K] = None
      var state: S = initialState
      it.map { case (k, stamp, v) =>
        if (!curKey.exists(ck => java.util.Objects.deepEquals(ck, k))) {
          curKey = Some(k); state = initialState
        }
        val o = output(state, v)
        state = update(state, v)
        (k, o, stamp)
      }
    }
    new GStream(out, Some((x: (K, O, Long)) => x._3))
  }

  /** Shared lowering for the keyed-state scans: one shuffle on the key,
    * spill-safe external sort within partitions on (key[, stamp]), then a
    * sequential partition scan — the distributed analog of time-sorted
    * keyed state with NO per-key buffering.
    */
  private def timeSortedScan[K, V, R](keyFn: T => K, valueFn: T => V,
      sortByStamp: Boolean)(scan: Iterator[(K, Long, V)] => Iterator[R])(
      implicit tupe: Encoder[(K, Long, V)], re: Encoder[R]): Dataset[R] = {
    val et: T => Long =
      if (sortByStamp) requireTime else eventTime.getOrElse(_ => 0L)
    val keyed = ds.map(t => (keyFn(t), et(t), valueFn(t)))
    val sortedDs =
      if (sortByStamp)
        keyed.repartition(keyed.col("_1"))
          .sortWithinPartitions(keyed.col("_1"), keyed.col("_2"))
      else
        keyed.repartition(keyed.col("_1"))
          .sortWithinPartitions(keyed.col("_1"))
    sortedDs.mapPartitions(scan)
  }

  def reduceValueStateByKeyUnsorted[K, V, S, O](keyFn: T => K, valueFn: T => V,
      initialState: S, output: (S, V) => O, update: (S, V) => S)(implicit
      ke: Encoder[K], tupe: Encoder[(K, Long, V)],
      oute: Encoder[(K, O)]): GStream[(K, O)] =
    reduceValueStateByKey(keyFn, valueFn, initialState, output, update,
      sorted = false)

  /** Convert to StreamElements (Stream.asStreamElements, Stream.java:210). */
  def asStreamElements(entity: String, keyFn: T => String, attrFn: T => String,
      valueFn: T => Array[Byte], stampFn: T => Long): GStream[StreamElement] = {
    implicit val enc: Encoder[StreamElement] = StreamElement.encoder
    GStream.ofElements(ds.map { t =>
      StreamElement.upsert(entity, keyFn(t), attrFn(t),
        java.util.UUID.randomUUID().toString, stampFn(t), valueFn(t))
    })
  }

  /** Write as an entity attribute into a family (Stream.persist,
    * Stream.java:268; BeamStream.persist:752).
    */
  def persist(family: graft.streaming.AttributeLogFamily, entity: String,
      keyFn: T => String, attrFn: T => String, valueFn: T => Array[Byte],
      stampFn: T => Long): Unit =
    family.append(
      asStreamElements(entity, keyFn, attrFn, valueFn, stampFn).ds)

  // ---- terminal ops (Stream.java:560-581) ----

  def collect(): Seq[T] = ds.collect().toSeq
  def count(): Long = ds.count()
  def print(): Unit = ds.show(false)

  private def requireTime: T => Long = eventTime.getOrElse(
    throw new IllegalStateException(
      "No event time assigned; call assignEventTime first"))
}

object GStream {
  /** Wrap a Dataset; StreamElement datasets get their stamp as event time. */
  def of[T](ds: Dataset[T]): GStream[T] = new GStream(ds, None)

  def ofElements(ds: Dataset[StreamElement]): GStream[StreamElement] =
    new GStream(ds, Some(_.stamp))

  def fromSeq[T: Encoder](spark: org.apache.spark.sql.SparkSession,
      data: Seq[T]): GStream[T] =
    new GStream(spark.createDataset(data), None)

  /** Shared union rule for both stream surfaces: keep the extractor only
    * when the two sides provably agree; any other combination throws so
    * the caller re-assigns on the union result.
    */
  private[api] def unionEventTime[T](l: Option[T => Long],
      r: Option[T => Long]): Option[T => Long] = (l, r) match {
    case (None, None) => None
    case (Some(f), Some(g)) if f eq g => Some(f)
    case _ => throw new IllegalArgumentException(
      "union sides carry different event-time assignments — call " +
        "assignEventTime on the union result instead")
  }
}
