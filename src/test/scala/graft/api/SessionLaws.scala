package graft.api

import org.scalacheck.{Gen, Prop, Properties, Test}

import graft.SparkSpec

/** Property laws for the session-window machinery after the r10 rework
  * (spill-safe partition gap-merge assignment; cross-input session-merged
  * joins):
  *
  *  1. assignment == the in-memory per-key reference fold (sort by stamp,
  *     split when the gap closes, window = [first stamp, last stamp + gap));
  *  2. join == the reference CoGBK model: merge sessions over the UNION of
  *     both sides' stamps, then per merged session emit lefts × rights
  *     (inner) / lefts × (rights or None) (left-outer).
  *
  * Each case runs Spark jobs, so the case counts stay modest.
  */
object SessionLaws extends Properties("SessionWindows") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(8)

  private lazy val spark = SparkSpec.spark
  import SparkSpec.spark.implicits._

  private val elemGen: Gen[List[(Long, String, Int)]] =
    Gen.nonEmptyListOf(for {
      t <- Gen.choose(0L, 60L)
      k <- Gen.oneOf("a", "b", "c")
      v <- Gen.choose(0, 99)
    } yield (t, k, v))

  private val gapGen: Gen[Long] = Gen.choose(1L, 12L)

  /** Reference gap merge over sorted stamps: session id per element. */
  private def sessionsOf(stamps: Seq[Long], gap: Long): Seq[(Long, Long, Long)] = {
    // (start, end, count) per session in stamp order
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long)]
    var start = Long.MinValue; var end = Long.MinValue; var n = 0L
    stamps.sorted.foreach { s =>
      if (s >= end) { if (n > 0) out += ((start, end, n)); start = s; n = 0 }
      end = s + gap
      n += 1
    }
    if (n > 0) out += ((start, end, n))
    out.toSeq
  }

  private def stream(xs: List[(Long, String, Int)]): GStream[(Long, String, Int)] =
    GStream.fromSeq(spark, xs).assignEventTime(_._1)

  property("assignment == per-key reference gap merge") =
    Prop.forAll(elemGen, gapGen) { (xs, gap) =>
      val got = stream(xs).sessionWindow(gap).countByKey(_._2).collect()
        .map(x => (x._2, x._1.start, x._1.end, x._3)).sorted.toSeq
      val want = xs.groupBy(_._2).toSeq.flatMap { case (k, es) =>
        sessionsOf(es.map(_._1), gap).map { case (s, e, n) => (k, s, e, n) }
      }.sorted
      Prop(got == want) :| s"got=$got want=$want"
    }

  /** Reference CoGBK session join: per key, merge sessions over BOTH
    * sides' stamps, then pair within each merged session.
    */
  private def refJoin(ls: Seq[(Long, String, Int)], rs: Seq[(Long, String, Int)],
      gap: Long): (Set[(String, Int, Int)], Set[(String, Int, Option[Int])]) = {
    val inner = scala.collection.mutable.Set.empty[(String, Int, Int)]
    val louter = scala.collection.mutable.Set.empty[(String, Int, Option[Int])]
    (ls.map(_._2) ++ rs.map(_._2)).distinct.foreach { k =>
      val lk = ls.filter(_._2 == k); val rk = rs.filter(_._2 == k)
      val merged = sessionsOf((lk ++ rk).map(_._1), gap)
      merged.foreach { case (s, e, _) =>
        val lIn = lk.filter(x => x._1 >= s && x._1 < e)
        val rIn = rk.filter(x => x._1 >= s && x._1 < e)
        for (l <- lIn; r <- rIn) inner += ((k, l._3, r._3))
        if (rIn.isEmpty) lIn.foreach(l => louter += ((k, l._3, None)))
        else for (l <- lIn; r <- rIn) louter += ((k, l._3, Some(r._3)))
      }
    }
    (inner.toSet, louter.toSet)
  }

  property("session join/leftJoin == merged-session CoGBK model") =
    Prop.forAll(elemGen, elemGen, gapGen) { (ls, rs, gap) =>
      val (wantInner, wantLeft) = refJoin(ls, rs, gap)
      val left = stream(ls); val right = stream(rs)
      val gotInner = left.sessionWindow(gap)
        .join(right, (l: (Long, String, Int)) => l._2,
          (r: (Long, String, Int)) => r._2)
        .collect().map(x => (x._1, x._2._3, x._3._3)).toSet
      val gotLeft = left.sessionWindow(gap)
        .leftJoin(right, (l: (Long, String, Int)) => l._2,
          (r: (Long, String, Int)) => r._2)
        .collect().map(x => (x._1, x._2._3, x._3.map(_._3))).toSet
      (Prop(gotInner == wantInner) :| s"inner got=$gotInner want=$wantInner") &&
        (Prop(gotLeft == wantLeft) :| s"left got=$gotLeft want=$wantLeft")
    }
}
