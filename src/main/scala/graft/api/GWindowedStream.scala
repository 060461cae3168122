package graft.api

import org.apache.spark.sql.{Dataset, Encoder}

/** Windowed aggregation surface — typed Scala analog of the reference's
  * WindowedStream (reference: tools/.../WindowedStream.java:27; Beam impl
  * beam/tools/.../BeamWindowedStream.java:74). Every aggregation is
  * per-window; outputs carry the window explicitly as [[TimeWindow]].
  *
  * Lowering strategy per operator:
  *  - fixed/sliding/calendar/global windows: pure per-element window
  *    assignment (flatMap) — no shuffle until the keyed aggregation itself;
  *  - session windows: per-key gap merge inside the grouping operator (the
  *    reference's Sessions WindowFn also merges per key at GBK time);
  *  - `combine`-family ops use `reduceGroups`, which Spark executes with
  *    partial (map-side) aggregation — the Combine.perKey lifting the
  *    reference gets from Beam (BeamWindowedStream.java:246);
  *  - `reduce`/`groupReduce` materialize groups per (window,key) — same
  *    contract as the reference's GroupByKey path (WindowedStream.java:40
  *    documents the non-commutative allowance).
  */
final class GWindowedStream[T](stream: GStream[T], windowing: Windowing)
    extends Serializable {

  private def ds: Dataset[T] = stream.ds

  /** Assign windows per (key, element); sessions merge per key. */
  private def assigned[K](keyFn: T => K)(implicit
      ke: Encoder[K], we: Encoder[(TimeWindow, K, T)]): Dataset[(TimeWindow, K, T)] =
    windowing match {
      case SessionWindows(gap) =>
        val et = eventTimeFn
        ds.groupByKey(keyFn).flatMapGroups { (k: K, it: Iterator[T]) =>
          val elems = it.toSeq.sortBy(et)
          val out = collection.mutable.ArrayBuffer.empty[(TimeWindow, K, T)]
          var sessStart = Long.MinValue
          var sessEnd = Long.MinValue
          var sess = collection.mutable.ArrayBuffer.empty[T]
          def flush(): Unit = if (sess.nonEmpty) {
            val w = TimeWindow(sessStart, sessEnd)
            sess.foreach(t => out += ((w, k, t)))
            sess.clear()
          }
          elems.foreach { t =>
            val s = et(t)
            if (s >= sessEnd) { flush(); sessStart = s }
            sessEnd = s + gap
            sess += t
          }
          flush()
          out.iterator
        }
      case w =>
        val et =
          if (w == GlobalWindowing) stream.eventTime.getOrElse((_: T) => 0L)
          else eventTimeFn
        ds.flatMap(t => w.assign(et(t)).map(tw => (tw, keyFn(t), t)))
    }

  /** Pair every element with its assigned window(s) — the reference's
    * standalone `withWindow` operator (Stream.withWindow; GroovyEnvTest
    * exercises it to inspect window assignment). Sliding windows emit one
    * pair per covering window, sessions one pair per merged session.
    */
  def withWindow(implicit ke: Encoder[Int], we: Encoder[(TimeWindow, Int, T)],
      oe: Encoder[(TimeWindow, T)]): GStream[(TimeWindow, T)] =
    new GStream(assigned[Int](_ => 0).map(x => (x._1, x._3)), None)

  private def eventTimeFn: T => Long = stream.eventTime.getOrElse(
    throw new IllegalStateException(
      "Windowed aggregation requires event time; call assignEventTime"))

  // ---- aggregations (WindowedStream.java:40-523) ----

  /** Keyed fold per window; non-commutative accumulators allowed
    * (WindowedStream.reduce, WindowedStream.java:40).
    */
  def reduce[K, S](keyFn: T => K, initial: S, fold: (S, T) => S)(implicit
      ke: Encoder[K], we: Encoder[(TimeWindow, K, T)],
      wke: Encoder[(TimeWindow, K)],
      oe: Encoder[(TimeWindow, K, S)]): GStream[(TimeWindow, K, S)] = {
    val a = assigned(keyFn)
    val out = a.groupByKey(x => (x._1, x._2))
      .mapGroups { (wk: (TimeWindow, K), it: Iterator[(TimeWindow, K, T)]) =>
        (wk._1, wk._2, it.foldLeft(initial)((s, x) => fold(s, x._3)))
      }
    new GStream(out, None)
  }

  /** Associative keyed combine with map-side partial aggregation
    * (WindowedStream.combine, WindowedStream.java:168).
    */
  def combine[K, V](keyFn: T => K, valueFn: T => V, merge: (V, V) => V)(implicit
      ke: Encoder[K], we: Encoder[(TimeWindow, K, T)],
      wke: Encoder[(TimeWindow, K)], ve: Encoder[V],
      tve: Encoder[((TimeWindow, K), V)],
      oe: Encoder[(TimeWindow, K, V)]): GStream[(TimeWindow, K, V)] = {
    val a = assigned(keyFn)
    val out = a.groupByKey(x => (x._1, x._2))
      .mapValues(x => valueFn(x._3))
      .reduceGroups(merge)
      .map { case ((w, k), v) => (w, k, v) }
    new GStream(out, None)
  }

  /** Whole-group UDF per (window, key), N outputs
    * (WindowedStream.groupReduce, WindowedStream.java:129).
    */
  def groupReduce[K, O](keyFn: T => K, fn: (TimeWindow, K, Seq[T]) => IterableOnce[O])(
      implicit ke: Encoder[K], we: Encoder[(TimeWindow, K, T)],
      wke: Encoder[(TimeWindow, K)], oe: Encoder[O]): GStream[O] = {
    val a = assigned(keyFn)
    val out = a.groupByKey(x => (x._1, x._2))
      .flatMapGroups { (wk: (TimeWindow, K), it: Iterator[(TimeWindow, K, T)]) =>
        fn(wk._1, wk._2, it.map(_._3).toSeq)
      }
    new GStream(out, None)
  }

  def countByKey[K](keyFn: T => K)(implicit
      ke: Encoder[K], we: Encoder[(TimeWindow, K, T)],
      wke: Encoder[(TimeWindow, K)], ve: Encoder[Long],
      tve: Encoder[((TimeWindow, K), Long)],
      oe: Encoder[(TimeWindow, K, Long)]): GStream[(TimeWindow, K, Long)] =
    combine[K, Long](keyFn, _ => 1L, _ + _)

  def sumByKey[K](keyFn: T => K, valueFn: T => Double)(implicit
      ke: Encoder[K], we: Encoder[(TimeWindow, K, T)],
      wke: Encoder[(TimeWindow, K)], ve: Encoder[Double],
      tve: Encoder[((TimeWindow, K), Double)],
      oe: Encoder[(TimeWindow, K, Double)]): GStream[(TimeWindow, K, Double)] =
    combine[K, Double](keyFn, valueFn, _ + _)

  def averageByKey[K](keyFn: T => K, valueFn: T => Double)(implicit
      ke: Encoder[K], we: Encoder[(TimeWindow, K, T)],
      wke: Encoder[(TimeWindow, K)], ve: Encoder[(Double, Long)],
      tve: Encoder[((TimeWindow, K), (Double, Long))],
      oe: Encoder[(TimeWindow, K, Double)],
      ie: Encoder[(TimeWindow, K, (Double, Long))]): GStream[(TimeWindow, K, Double)] = {
    val c = combine[K, (Double, Long)](keyFn, t => (valueFn(t), 1L),
      (a, b) => (a._1 + b._1, a._2 + b._2))
    new GStream(c.ds.map { case (w, k, (s, n)) => (w, k, s / n) }, None)
  }

  def count()(implicit
      ke: Encoder[Int], we: Encoder[(TimeWindow, Int, T)],
      wke: Encoder[(TimeWindow, Int)], ve: Encoder[Long],
      tve: Encoder[((TimeWindow, Int), Long)],
      oe: Encoder[(TimeWindow, Int, Long)],
      fe: Encoder[(TimeWindow, Long)]): GStream[(TimeWindow, Long)] = {
    val c = countByKey[Int](_ => 0)
    new GStream(c.ds.map { case (w, _, n) => (w, n) }, None)
  }

  def sum(valueFn: T => Double)(implicit
      ke: Encoder[Int], we: Encoder[(TimeWindow, Int, T)],
      wke: Encoder[(TimeWindow, Int)], ve: Encoder[Double],
      tve: Encoder[((TimeWindow, Int), Double)],
      oe: Encoder[(TimeWindow, Int, Double)],
      fe: Encoder[(TimeWindow, Double)]): GStream[(TimeWindow, Double)] = {
    val c = sumByKey[Int](_ => 0, valueFn)
    new GStream(c.ds.map { case (w, _, v) => (w, v) }, None)
  }

  /** Distinct by representative value per window
    * (WindowedStream.distinct, WindowedStream.java:490).
    */
  def distinct[K](mapper: T => K)(implicit
      ke: Encoder[K], we: Encoder[(TimeWindow, K, T)],
      wke: Encoder[(TimeWindow, K)]): GStream[(TimeWindow, K)] = {
    val a = assigned(mapper)
    new GStream(a.map(x => (x._1, x._2))(wke).distinct(), None)
  }

  /** Total sort per window (WindowedStream.sorted, WindowedStream.java:382).
    *
    * BOUND: the output value is one `Seq` PER WINDOW, so each window's
    * contents materialize in a single task — the reference's own FIXME on
    * its single-key GBK, inherent to the operator's return shape. Safe for
    * windows that fit in executor memory; for unbounded windows use
    * [[sortedPrefix]] (memory O(n)) or the columnar distributed
    * `orderBy`/`limit` path (`queries/RelationalQueries` top-k).
    */
  def sorted(ord: Ordering[T])(implicit
      ke: Encoder[Int], we: Encoder[(TimeWindow, Int, T)],
      wke: Encoder[(TimeWindow, Int)],
      oe: Encoder[(TimeWindow, Seq[T])]): GStream[(TimeWindow, Seq[T])] = {
    val a = assigned[Int](_ => 0)
    val out = a.groupByKey(x => (x._1, x._2))
      .mapGroups { (wk: (TimeWindow, Int), it: Iterator[(TimeWindow, Int, T)]) =>
        (wk._1, it.map(_._3).toSeq.sorted(ord))
      }
    new GStream(out, None)
  }

  /** First `n` elements per window in sort order — the bounded-memory
    * variant of [[sorted]]: each task keeps a size-n bounded buffer while
    * streaming through its group (O(n) memory regardless of window size,
    * the shape the reference's FIXME asks for).
    */
  def sortedPrefix(n: Int, ord: Ordering[T])(implicit
      ke: Encoder[Int], we: Encoder[(TimeWindow, Int, T)],
      wke: Encoder[(TimeWindow, Int)],
      oe: Encoder[(TimeWindow, Seq[T])]): GStream[(TimeWindow, Seq[T])] = {
    val a = assigned[Int](_ => 0)
    val out = a.groupByKey(x => (x._1, x._2))
      .mapGroups { (wk: (TimeWindow, Int), it: Iterator[(TimeWindow, Int, T)]) =>
        // bounded max-heap of the n smallest: evict the largest on overflow
        val heap = new scala.collection.mutable.PriorityQueue[T]()(ord)
        it.foreach { x =>
          heap += x._3
          if (heap.size > n) heap.dequeue()
        }
        (wk._1, heap.dequeueAll.reverse.toSeq)
      }
    new GStream(out, None)
  }

  // ---- joins (WindowedStream.java:316-374) ----

  /** Windowed inner equi-join; right side re-windowed to this stream's
    * windowing (WindowedStream.join, WindowedStream.java:316; Beam
    * CoGroupByKey BeamWindowedStream.java:371).
    */
  def join[U, K](right: GStream[U], leftKey: T => K, rightKey: U => K)(implicit
      ke: Encoder[K], wet: Encoder[(TimeWindow, K, T)],
      weu: Encoder[(TimeWindow, K, U)],
      oe: Encoder[(K, T, U)]): GStream[(K, T, U)] = {
    val (lw, rw) = windowedSides(right, leftKey, rightKey)
    val joined = lw.joinWith(rw,
      lw("_1") === rw("_1") && lw("_2") === rw("_2"), "inner")
    new GStream(joined.map { case (l, r) => (l._2, l._3, r._3) }, None)
  }

  /** Windowed left outer equi-join (WindowedStream.leftJoin,
    * WindowedStream.java:351).
    */
  def leftJoin[U, K](right: GStream[U], leftKey: T => K, rightKey: U => K)(
      implicit ke: Encoder[K], wet: Encoder[(TimeWindow, K, T)],
      weu: Encoder[(TimeWindow, K, U)],
      oe: Encoder[(K, T, Option[U])]): GStream[(K, T, Option[U])] = {
    val (lw, rw) = windowedSides(right, leftKey, rightKey)
    val joined = lw.joinWith(rw,
      lw("_1") === rw("_1") && lw("_2") === rw("_2"), "left_outer")
    new GStream(joined.map { case (l, r) =>
      (l._2, l._3, Option(r).map(_._3))
    }, None)
  }

  private def windowedSides[U, K](right: GStream[U], leftKey: T => K,
      rightKey: U => K)(implicit
      ke: Encoder[K], wet: Encoder[(TimeWindow, K, T)],
      weu: Encoder[(TimeWindow, K, U)]) = {
    (assigned(leftKey), new GWindowedStream(right, windowing).assigned(rightKey))
  }
}
