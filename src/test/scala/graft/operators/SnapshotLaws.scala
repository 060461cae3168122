package graft.operators

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

import graft.SparkSpec
import graft.core.StreamElement

/** Model-based property checks of snapshot compaction (the SURVEY §5 plan:
  * ScalaCheck for snapshot-reduction laws — replay-order invariance,
  * idempotence, tombstone correctness — against an in-memory oracle fold).
  */
object SnapshotLaws extends Properties("SnapshotCompact") {

  // each sample runs Spark jobs; 15 diverse logs per law is plenty
  override def overrideParameters(p: org.scalacheck.Test.Parameters): org.scalacheck.Test.Parameters =
    p.withMinSuccessfulTests(15)

  private lazy val spark = SparkSpec.spark

  private val genElement: Gen[StreamElement] = for {
    key <- Gen.oneOf("k1", "k2")
    kind <- Gen.frequency(6 -> "up", 2 -> "del", 2 -> "wc")
    suffix <- Gen.choose(1, 3)
    scalar <- Gen.oneOf(true, false)
    attr = if (kind == "wc") "device.*"
      else if (scalar) "status" else s"device.$suffix"
    stamp <- Gen.choose(1L, 20L)
    seq <- Gen.choose(1L, 1000L)
  } yield StreamElement("e", key, attr, s"u$seq", seq, stamp,
    if (kind == "up") s"v$seq".getBytes else null,
    delete = kind != "up", deleteWildcard = kind == "wc")

  private val genLog: Gen[List[StreamElement]] =
    Gen.choose(0, 12).flatMap(n => Gen.listOfN(n, genElement))

  private type Pos = (Long, Long, String)
  private val posOrd = implicitly[Ordering[Pos]]
  private def pos(e: StreamElement): Pos = (e.stamp, e.seqId, e.uuid)

  /** In-memory oracle: latest per (key, attr); survivors = non-deletes
    * strictly newer than their prefix's newest wildcard tombstone.
    */
  private def model(xs: Seq[StreamElement]): Set[(String, String, Long, Long)] = {
    val latest = xs.groupBy(e => (e.key, e.attribute))
      .map { case (_, es) => es.maxBy(pos)(posOrd) }
    val wc = xs.filter(_.deleteWildcard)
      .groupBy(e => (e.key, e.attributePrefix))
      .map { case (kp, es) => kp -> pos(es.maxBy(pos)(posOrd)) }
    latest.filter { e =>
      !e.delete && wc.get((e.key, e.attributePrefix))
        .forall(w => posOrd.gt(pos(e), w))
    }.map(e => (e.key, e.attribute, e.stamp, e.seqId)).toSet
  }

  private def engine(xs: Seq[StreamElement]): Set[(String, String, Long, Long)] =
    SnapshotCompact.snapshot(
      spark.createDataset(xs)(StreamElement.encoder))
      .collect().map(e => (e.key, e.attribute, e.stamp, e.seqId)).toSet

  property("matches in-memory model") = forAll(genLog) { xs =>
    engine(xs) == model(xs)
  }

  property("replay order irrelevant") = forAll(genLog) { xs =>
    engine(xs) == engine(scala.util.Random.shuffle(xs))
  }

  property("idempotent: snapshot of a snapshot is itself") = forAll(genLog) { xs =>
    val once = SnapshotCompact.snapshot(
      spark.createDataset(xs)(StreamElement.encoder)).collect().toSeq
    engine(once) == model(xs)
  }

  property("single-pass aggregator agrees with two-pass and model") =
    forAll(genLog) { xs =>
      val single = LatestWithTombstones.snapshot(
        spark.createDataset(xs)(StreamElement.encoder))
        .collect().map(e => (e.key, e.attribute, e.stamp, e.seqId)).toSet
      single == model(xs)
    }

  property("retained compaction is an UNCONDITIONAL semigroup: " +
      "re-compacting a compacted prefix with ANY suffix == full") =
    forAll(genLog, Gen.choose(0, 12)) { (xs, cut) =>
      // arbitrary split — NOT stamp-ordered; late data crosses the cut
      val (a, b) = xs.splitAt(cut min xs.length)
      val once = LatestWithTombstones.compactRetaining(
        spark.createDataset(a)(StreamElement.encoder)).collect().toSeq
      val inc = LatestWithTombstones.compactRetaining(
          spark.createDataset(once ++ b)(StreamElement.encoder))
        .collect().filterNot(_.delete)
        .map(e => (e.key, e.attribute, e.stamp, e.seqId)).toSet
      inc == model(xs)
    }

  property("snapshot == retained compaction with tombstones hidden") =
    forAll(genLog) { xs =>
      val ds = spark.createDataset(xs)(StreamElement.encoder)
      val viaRetained = LatestWithTombstones.compactRetaining(ds)
        .collect().filterNot(_.delete)
        .map(e => (e.key, e.attribute, e.stamp, e.seqId)).toSet
      viaRetained == model(xs)
    }

  property("incremental merge at any stamp watermark == full compaction") =
    forAll(genLog, Gen.choose(0L, 21L)) { (xs, t) =>
      // split by stamp: stamp dominates the position ordering, so every
      // delta position is strictly newer — the compact-to-watermark
      // precondition IncrementalSnapshot.merge requires
      val (hist, delta) = xs.partition(_.stamp <= t)
      val prev = LatestWithTombstones.snapshot(
        spark.createDataset(hist)(StreamElement.encoder))
      val inc = IncrementalSnapshot.merge(
          prev, spark.createDataset(delta)(StreamElement.encoder))
        .collect().map(e => (e.key, e.attribute, e.stamp, e.seqId)).toSet
      inc == model(xs)
    }
}
