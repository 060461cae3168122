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

  /** Assign windows per (key, element); sessions merge per key.
    *
    * Session lowering: repartition by key + sortWithinPartitions(key, time)
    * + a partition gap-merge scan — the same spill-safe shape as
    * [[GStream.integratePerKey]]. Memory is bounded by the largest single
    * SESSION (elements buffer only until their session's gap closes), not
    * by the largest key, unlike a groupByKey materialization. The event
    * time rides pre-shuffle in TimeWindow.start so the scan reuses the
    * (TimeWindow, K, T) encoder every aggregation already carries.
    */
  private def assigned[K](keyFn: T => K)(implicit
      ke: Encoder[K], we: Encoder[(TimeWindow, K, T)]): Dataset[(TimeWindow, K, T)] =
    windowing match {
      case SessionWindows(gap) =>
        val et = eventTimeFn
        val keyed = ds.map(t => (TimeWindow(et(t), 0L), keyFn(t), t))
        keyed
          .repartition(keyed.col("_2"))
          .sortWithinPartitions(keyed.col("_2"), keyed.col("_1.start"))
          .mapPartitions { it =>
            new Iterator[(TimeWindow, K, T)] {
              private var pending: Iterator[(TimeWindow, K, T)] = Iterator.empty
              private var curKey: Option[K] = None
              private var sessStart = Long.MinValue
              private var sessEnd = Long.MinValue
              private val buf =
                collection.mutable.ArrayBuffer.empty[T]
              private def flush(): Iterator[(TimeWindow, K, T)] =
                if (buf.isEmpty) Iterator.empty
                else {
                  val w = TimeWindow(sessStart, sessEnd)
                  val k = curKey.get
                  val snap = buf.toVector
                  buf.clear()
                  snap.iterator.map(t => (w, k, t))
                }
              def hasNext: Boolean = {
                while (!pending.hasNext && it.hasNext) {
                  val (tw, k, t) = it.next()
                  val s = tw.start
                  val newKey = !curKey.exists(ck =>
                    java.util.Objects.deepEquals(ck, k))
                  if (newKey || s >= sessEnd) {
                    pending = flush()
                    curKey = Some(k)
                    sessStart = s
                  }
                  sessEnd = s + gap
                  buf += t
                }
                if (!pending.hasNext && !it.hasNext && buf.nonEmpty)
                  pending = flush()
                pending.hasNext
              }
              def next(): (TimeWindow, K, T) = {
                if (!hasNext) throw new NoSuchElementException
                pending.next()
              }
            }
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

  /** Allowed-lateness marker (WindowedStream.withAllowedLateness:539). On
    * this BOUNDED lowering the watermark conceptually jumps past every
    * element only after all input is read, so nothing is ever late and the
    * op is the identity — exactly Beam's batch-mode behavior the reference
    * inherits (GroovyEnvTest:910 composes it in batch). The STREAMING
    * lowering enforces lateness for real via
    * [[graft.streaming.EventTimeWindows]] (q_late_drop / q_late_split).
    */
  def withAllowedLateness(ms: Long): GWindowedStream[T] = {
    require(ms >= 0, s"allowed lateness must be >= 0, got $ms")
    this
  }

  /** The underlying element stream — for chaining the window-agnostic
    * keyed-state ops after a windowing declaration, as the reference's
    * WindowedStream allows directly (GroovyEnvTest:910 chains
    * windowAll().withAllowedLateness(..).reduceValueStateByKey(..)).
    */
  def unwindowed: GStream[T] = stream

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
    *
    * Session windows join on MERGED sessions across both inputs (Beam's
    * Sessions WindowFn merges at the CoGBK over the union of both sides'
    * timestamps): assigning sessions per side independently and joining on
    * exact window equality would almost never match — a left element at
    * t=0 and a right at t=100 sit in the same conceptual session but in
    * different per-side windows (0, gap) vs (100, 100 + gap).
    */
  def join[U, K](right: GStream[U], leftKey: T => K, rightKey: U => K)(implicit
      ke: Encoder[K], wet: Encoder[(TimeWindow, K, T)],
      weu: Encoder[(TimeWindow, K, U)],
      oe: Encoder[(K, T, U)]): GStream[(K, T, U)] = windowing match {
    case SessionWindows(gap) =>
      new GStream(sessionCoGrouped[U, K, (K, T, U)](right, leftKey, rightKey,
        gap, (k, ls, rs) => for { t <- ls; u <- rs } yield (k, t, u)), None)
    case _ =>
      val (lw, rw) = windowedSides(right, leftKey, rightKey)
      val joined = lw.joinWith(rw,
        lw("_1") === rw("_1") && lw("_2") === rw("_2"), "inner")
      new GStream(joined.map { case (l, r) => (l._2, l._3, r._3) }, None)
  }

  /** Windowed left outer equi-join (WindowedStream.leftJoin,
    * WindowedStream.java:351). Sessions merge across inputs — see [[join]].
    */
  def leftJoin[U, K](right: GStream[U], leftKey: T => K, rightKey: U => K)(
      implicit ke: Encoder[K], wet: Encoder[(TimeWindow, K, T)],
      weu: Encoder[(TimeWindow, K, U)],
      oe: Encoder[(K, T, Option[U])]): GStream[(K, T, Option[U])] = windowing match {
    case SessionWindows(gap) =>
      new GStream(sessionCoGrouped[U, K, (K, T, Option[U])](right, leftKey,
        rightKey, gap, (k, ls, rs) =>
          if (rs.isEmpty) ls.map(t => (k, t, None))
          else for { t <- ls; u <- rs } yield (k, t, Some(u))), None)
    case _ =>
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

  /** Per-key cogroup with gap sessions merged over the UNION of both
    * sides' event times; `emit` receives each merged session's left and
    * right slices. Memory bounds per (key): both side groups materialize —
    * inherent to a per-session cross product, same contract as the
    * reference's CoGBK path.
    */
  private def sessionCoGrouped[U, K, R](right: GStream[U], leftKey: T => K,
      rightKey: U => K, gap: Long,
      emit: (K, Seq[T], Seq[U]) => IterableOnce[R])(implicit
      ke: Encoder[K], re: Encoder[R]): Dataset[R] = {
    val let = eventTimeFn
    val ret = right.eventTime.getOrElse(throw new IllegalStateException(
      "session-windowed join requires event time on BOTH sides; " +
        "call assignEventTime on the right stream"))
    ds.groupByKey(leftKey).cogroup(right.ds.groupByKey(rightKey)) {
      (k: K, li: Iterator[T], ri: Iterator[U]) =>
        val ls = li.toVector.sortBy(let)
        val rs = ri.toVector.sortBy(ret)
        val out = collection.mutable.ArrayBuffer.empty[R]
        val lbuf = collection.mutable.ArrayBuffer.empty[T]
        val rbuf = collection.mutable.ArrayBuffer.empty[U]
        var sessEnd = Long.MinValue
        def flush(): Unit = if (lbuf.nonEmpty || rbuf.nonEmpty) {
          out ++= emit(k, lbuf.toSeq, rbuf.toSeq)
          lbuf.clear(); rbuf.clear()
        }
        // two-pointer sweep over the merged time-sorted stamp sequence
        var i = 0
        var j = 0
        while (i < ls.length || j < rs.length) {
          val takeLeft = j >= rs.length ||
            (i < ls.length && let(ls(i)) <= ret(rs(j)))
          val s = if (takeLeft) let(ls(i)) else ret(rs(j))
          if (s >= sessEnd) flush()
          sessEnd = s + gap
          if (takeLeft) { lbuf += ls(i); i += 1 }
          else { rbuf += rs(j); j += 1 }
        }
        flush()
        out.iterator
    }
  }
}
