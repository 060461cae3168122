package graft.streaming

import java.util.UUID

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.Encoders
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

import graft.SparkSpec
import graft.core.StreamElement

/** Model-based cut-invariance laws for the streaming keyed-state
  * lowerings: however an event-time-ordered changelog is cut into
  * micro-batches, the streaming fold must equal the batch lowering —
  * the contract every staged-log oracle row pins at ONE fixed slicing
  * (tercile / event_id%3), checked here across random logs and random
  * cut points. The reference runs one code path for both modes
  * (Stream.java:386/520 execute on bounded and unbounded alike), so
  * mode-equivalence is its documented semantics, not an accident.
  *
  * Stamps are generated DISTINCT per log: the streaming fold orders by
  * (stamp, seqId) within each batch while the batch lowering sorts by
  * stamp alone, so stamp ties have no defined cross-mode order — the
  * contract is only total where event time is total.
  */
object StateCutLaws extends Properties("StateOpsCutInvariance") {

  // every sample drives a real MemoryStream query per cut; 6 diverse
  // logs per law keeps the suite's property budget
  override def overrideParameters(p: org.scalacheck.Test.Parameters): org.scalacheck.Test.Parameters =
    p.withMinSuccessfulTests(6)

  private lazy val spark = SparkSpec.spark
  private implicit lazy val ee: org.apache.spark.sql.Encoder[StreamElement] =
    StreamElement.encoder

  /** (event-time-sorted log with distinct stamps, interior cut points). */
  private val genLogAndCuts: Gen[(List[StreamElement], List[Int])] = for {
    n <- Gen.choose(2, 16)
    keys <- Gen.listOfN(n, Gen.oneOf("a", "b", "c"))
    vals <- Gen.listOfN(n, Gen.choose(1, 9))
    stamps <- Gen.pick(n, 1 to 200)
    cuts <- Gen.someOf(1 until n)
  } yield {
    val log = keys.lazyZip(vals).lazyZip(stamps.toList).toList.zipWithIndex.map {
      case ((k, v, st), i) =>
        StreamElement("e", k, "x", s"u$i", i.toLong, st * 1000L,
          v.toString.getBytes("UTF-8"), delete = false, deleteWildcard = false)
    }.sortBy(_.stamp)
    (log, cuts.toList.sorted)
  }

  private def segments(log: List[StreamElement], cuts: List[Int]): List[List[StreamElement]] =
    (0 :: cuts).zip(cuts :+ log.length).map { case (a, b) => log.slice(a, b) }
      .filter(_.nonEmpty)

  /** Feed `segs` one micro-batch each through `f`, return the sink rows. */
  private def runStreamed[T](segs: List[List[StreamElement]])(
      f: Dataset[StreamElement] => Dataset[T]): Seq[org.apache.spark.sql.Row] = {
    implicit val sq = spark.sqlContext
    val input = MemoryStream[StreamElement]
    val sink = "cutlaw_" + UUID.randomUUID().toString.replace("-", "")
    val q = f(input.toDS()).writeStream.format("memory").queryName(sink)
      .outputMode("update").start()
    try {
      segs.foreach { seg => input.addData(seg); q.processAllAvailable() }
      spark.table(sink).collect().toSeq
    } finally {
      q.stop()
      spark.catalog.dropTempView(sink)
    }
  }

  private def num(e: StreamElement): Double =
    new String(e.value, "UTF-8").toDouble

  property("integratePerKey: any event-time-ordered cut equals the batch fold") =
    forAll(genLogAndCuts) { case (log, cuts) =>
      val streamed = runStreamed(segments(log, cuts)) { ds =>
        StateOps.integratePerKey(ds, 0.0, num, _ + _)
      }.map(r => (r.getString(0), r.getDouble(2)))

      implicit val ke = Encoders.STRING
      implicit val tupe = Encoders.tuple(Encoders.STRING,
        Encoders.scalaLong, Encoders.scalaDouble)
      implicit val oute = Encoders.tuple(Encoders.STRING, Encoders.scalaDouble)
      val batch = new graft.api.GStream(spark.createDataset(log), None)
        .assignEventTime(_.stamp)
        .integratePerKey[String, Double](_.key, num, 0.0, _ + _)
        .ds.collect().toSeq

      streamed.sorted == batch.sorted
    }

  // --- snapshot maintenance: LWW is position-based, so the law holds
  // under ARBITRARY cuts of an arbitrarily-ordered changelog (no
  // watermark attached with cleanup=None → nothing is ever dropped) ---

  private val genSnapElement: Gen[StreamElement] = for {
    key <- Gen.oneOf("k1", "k2")
    kind <- Gen.frequency(6 -> "up", 2 -> "del", 2 -> "wc")
    suffix <- Gen.choose(1, 3)
    attr = if (kind == "wc") "device.*" else s"device.$suffix"
    stamp <- Gen.choose(1L, 20L)
    seq <- Gen.choose(1L, 1000L)
  } yield StreamElement("e", key, attr, s"u$seq", seq, stamp * 1000L,
    if (kind == "up") s"v$seq".getBytes else null,
    delete = kind != "up", deleteWildcard = kind == "wc")

  private val genSnapLogAndCuts: Gen[(List[StreamElement], List[Int])] = for {
    n <- Gen.choose(1, 14)
    log <- Gen.listOfN(n, genSnapElement)
    cuts <- Gen.someOf(1 until n)
  } yield (log, cuts.toList.sorted)

  property("snapshotUpdates: changelog winners equal the batch snapshot under any cut") =
    forAll(genSnapLogAndCuts) { case (log, cuts) =>
      val emissions = runStreamed(segments(log, cuts)) { ds =>
        StateOps.snapshotUpdates(ds)
      }
      // reconstruct visibility: per (key, attribute) the emission at the
      // top changelog position wins; visible iff it is an upsert
      val visible = emissions
        .map(r => (r.getString(1), r.getString(2),
          (r.getLong(5), r.getLong(4), r.getString(3)),
          r.getAs[Array[Byte]]("value"), r.getAs[Boolean]("delete")))
        .groupBy(t => (t._1, t._2)).values
        .map(_.maxBy(_._3))
        .collect { case (k, a, _, v, del) if !del => (k, a, new String(v, "UTF-8")) }
        .toSet

      val batch = graft.operators.SnapshotCompact
        .snapshot(spark.createDataset(log))
        .collect()
        .map(e => (e.key, e.attribute, new String(e.value, "UTF-8"))).toSet

      visible == batch
    }

  property("tumblingCounts: final panes equal the per-window count under any cut") =
    forAll(genSnapLogAndCuts) { case (log, cuts) =>
      // counts are order-insensitive and the lateness bound exceeds the
      // stamp range, so ANY segmentation must converge to the same final
      // pane (= max of the running panes) per (window, key) cell
      val panes = runStreamed(segments(log, cuts)) { ds =>
        EventTimeWindows.tumblingCounts(ds, sizeMs = 5L,
          allowedLatenessMs = 60000L)
      }.map(r => ((r.getLong(0), r.getString(1)), r.getLong(2)))
      val finalPanes = panes.groupBy(_._1).view.mapValues(_.map(_._2).max).toMap

      val expected = log.groupBy(e => (e.stamp / 5000 * 5000, e.key))
        .view.mapValues(_.size.toLong).toMap

      finalPanes == expected
    }

  // --- retract join: the ± ledger differs per cut (seq numbers,
  // intermediate retractions), but folding it with currentResult must
  // always land on the same live pair set — checked against an
  // independent latest-per-element-key model, not the operator's own
  // bounded path ---

  private val genJoinLogAndCuts: Gen[(List[(Boolean, StreamElement)], List[Int])] = for {
    n <- Gen.choose(2, 14)
    sides <- Gen.listOfN(n, Gen.oneOf(true, false))
    eks <- Gen.listOfN(n, Gen.choose(1, 3))
    jks <- Gen.listOfN(n, Gen.oneOf("j1", "j2"))
    dels <- Gen.listOfN(n, Gen.frequency(4 -> false, 1 -> true))
    vals <- Gen.listOfN(n, Gen.choose(1, 9))
    stamps <- Gen.pick(n, 1 to 200)
    cuts <- Gen.someOf(1 until n)
  } yield {
    val log = (0 until n).map { i =>
      val side = if (sides(i)) "l" else "r"
      (sides(i), StreamElement("e", s"$side${eks(i)}", jks(i), s"u$i",
        i.toLong, stamps.toList(i) * 1000L,
        if (dels(i)) null else vals(i).toString.getBytes("UTF-8"),
        delete = dels(i), deleteWildcard = false))
    }.toList.sortBy(_._2.stamp)
    (log, cuts.toList.sorted)
  }

  private type Pair = (String, String, String, String, String)

  /** Independent model: most-recent live value per (side, joinKey,
    * elemKey) — latest by (stamp, seqId) wins, a latest delete evicts —
    * then per join key the cross product of live sides.
    */
  private def joinModel(log: List[(Boolean, StreamElement)]): Set[Pair] = {
    def live(isLeft: Boolean) = log.filter(_._1 == isLeft).map(_._2)
      .groupBy(e => (e.attribute, e.key))
      .view.mapValues(_.maxBy(e => (e.stamp, e.seqId))).toMap
      .collect { case ((jk, ek), e) if !e.delete =>
        (jk, ek, new String(e.value, "UTF-8")) }
    (for {
      (jk, lk, lv) <- live(isLeft = true)
      (jk2, rk, rv) <- live(isLeft = false) if jk2 == jk
    } yield (jk, lk, rk, lv, rv)).toSet
  }

  property("retractJoin: folded ledger equals the most-recent join model under any cut") =
    forAll(genJoinLogAndCuts) { case (log, cuts) =>
      implicit val sq = spark.sqlContext
      implicit val ce = org.apache.spark.sql.Encoders.product[RetractJoin.Change]
      val lIn = MemoryStream[StreamElement]
      val rIn = MemoryStream[StreamElement]
      val sink = "cutlaw_" + UUID.randomUUID().toString.replace("-", "")
      val q = RetractJoin(lIn.toDS(), _.attribute, rIn.toDS(), _.attribute)
        .writeStream.format("memory").queryName(sink)
        .outputMode("update").start()
      val changes = try {
        segments(log.map(_._2), cuts).foreach { seg =>
          val segSet = seg.map(_.uuid).toSet
          val bySide = log.filter(t => segSet(t._2.uuid))
          lIn.addData(bySide.collect { case (true, e) => e })
          rIn.addData(bySide.collect { case (false, e) => e })
          q.processAllAvailable()
        }
        spark.table(sink).as[RetractJoin.Change].collect().toSeq
      } finally {
        q.stop()
        spark.catalog.dropTempView(sink)
      }
      val folded = RetractJoin.currentResult(changes).map(c =>
        (c.joinKey, c.leftKey, c.rightKey,
          new String(c.leftValue, "UTF-8"),
          new String(c.rightValue, "UTF-8"))).toSet

      folded == joinModel(log)
    }

  property("reduceValueStateByKey: order-sensitive fold is cut-invariant") =
    forAll(genLogAndCuts) { case (log, cuts) =>
      // state = concatenation of values seen so far; emit the PRE-update
      // state per element — any cross-batch reordering changes some
      // emitted prefix, so this catches order bugs counts cannot
      implicit val se = Encoders.STRING
      implicit val oe = Encoders.tuple(Encoders.STRING, Encoders.STRING)
      val streamed = runStreamed(segments(log, cuts)) { ds =>
        StateOps.reduceValueStateByKey[String, String](ds, "",
          (st, e) => st, (st, e) => st + new String(e.value, "UTF-8"))
      }.map(r => (r.getString(0), r.getString(1)))

      implicit val tupe = Encoders.tuple(Encoders.STRING,
        Encoders.scalaLong, Encoders.STRING)
      val batch = new graft.api.GStream(spark.createDataset(log), None)
        .assignEventTime(_.stamp)
        .reduceValueStateByKey[String, String, String, String](
          _.key, e => new String(e.value, "UTF-8"), "",
          (st, _) => st, (st, v) => st + v)
        .ds.collect().toSeq

      streamed.sorted == batch.sorted
    }
}
