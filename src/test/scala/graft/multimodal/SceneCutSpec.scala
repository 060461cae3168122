package graft.multimodal

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Laws for [[Multimodal.frameDeltas]] (consecutive Y-plane SAD — the
  * shot-boundary primitive) and the seeded-cut fixture behind
  * q_media_scene_cuts.
  */
class SceneCutSpec extends SparkSpec {
  import SparkSpec.spark.implicits._

  test("frameDeltas is the exact per-pixel |diff| sum over the Y plane") {
    // 2x2, 3 frames: Y values chosen by hand, U/V constant (ignored)
    val ys = Array(
      Array(10, 20, 30, 40),
      Array(12, 20, 25, 40), // SAD vs f0 = 2 + 0 + 5 + 0 = 7
      Array(200, 20, 25, 0)) // SAD vs f1 = 188 + 0 + 0 + 40 = 228
    val payload = MediaCodecs.encodeY4m(2, 2, 25, 1, 3, (f, p, i) =>
      if (p == 0) ys(f)(i) else 128)
    val media = Seq((7L, "video", payload)).toDF("media_id", "kind", "payload")
    val got = Multimodal.frameDeltas(media).collect()
      .map(d => (d.frameIdx, d.wh, d.sad)).sortBy(_._1).toSeq
    assert(got == Seq((1, 4, 7L), (2, 4, 228L)))
  }

  test("non-Y4M rows skip; a single-frame video has no deltas") {
    val oneFrame = MediaCodecs.encodeY4m(2, 2, 25, 1, 1, (_, _, _) => 5)
    val media = Seq(
      (1L, "video", oneFrame),
      (2L, "text", "not a video".getBytes("UTF-8"))
    ).toDF("media_id", "kind", "payload")
    assert(Multimodal.frameDeltas(media).collect().isEmpty)
  }

  test("sceneRepresentatives emits the first frame and length per scene") {
    // 6 frames, cuts at f=2 and f=5 (big Y jumps), drift elsewhere
    val base = Array(10, 10, 10, 10)
    def y(f: Int, i: Int): Int = f match {
      case 0 | 1     => base(i) + f          // scene 0: frames 0-1
      case 2 | 3 | 4 => base(i) + 150 + f    // scene 1: frames 2-4
      case _         => base(i) + 70 + f     // scene 2: frame 5 (|150-70|>thr)
    }
    val payload = MediaCodecs.encodeY4m(2, 2, 25, 1, 6,
      (f, p, i) => if (p == 0) y(f, i) else 128)
    val media = Seq((3L, "video", payload)).toDF("media_id", "kind", "payload")
    val got = Multimodal.sceneRepresentatives(media, sadPerPixel = 50)
      .collect().map(s => (s.sceneIdx, s.frameIdx, s.sceneFrames))
      .sortBy(_._1).toSeq
    assert(got == Seq((0, 0, 2), (1, 2, 3), (2, 5, 1)))
  }

  test("scene sampling on the seeded fixture == the seeded segmentation") {
    val vids = Multimodal.sceneVideos(spark, "/root/testdata/sf0.001")
    val got = Multimodal.sceneRepresentatives(vids, sadPerPixel = 50)
      .collect()
      .map(s => (s.mediaId, s.sceneIdx, s.frameIdx, s.sceneFrames)).toSet
    assert(got.nonEmpty)
    val expected = vids.select("media_id").as[Long].collect().flatMap { id =>
      val nf = (8 + id % 9).toInt
      val c = (3 + id % 4).toInt
      Iterator.range(0, nf, c).zipWithIndex.map { case (start, scene) =>
        (id, scene, start, math.min(c, nf - start))
      }
    }.toSet
    assert(got == expected)
  }

  test("seeded-cut fixture separates cleanly at the 50 SAD/pixel rule") {
    val vids = Multimodal.sceneVideos(spark, "/root/testdata/sf0.001")
    val deltas = Multimodal.frameDeltas(vids).toDF()
    val n = deltas.count()
    assert(n > 0)
    // classify each frame pair by the GENERATOR's seeded rule: a cut is
    // where frame f starts a new scene (f % c == 0, scene = f / c)
    val classified = deltas
      .withColumn("c", lit(3) + col("mediaId") % 4)
      .withColumn("isCut", col("frameIdx") % col("c") === 0)
    // the threshold must agree with the seed EXACTLY — no frame pair may
    // sit on the wrong side (a margin collapse would make the oracle's
    // replay of the same rule vacuous)
    val misclassified = classified
      .filter((col("sad") >= col("wh") * 50) =!= col("isCut")).count()
    assert(misclassified == 0, s"$misclassified frame pairs on the wrong side")
    // and both classes are populated (cuts exist, within-scene drift exists)
    val cuts = classified.filter(col("isCut")).count()
    assert(cuts > 0 && cuts < n, s"cuts=$cuts of $n")
    // quantify the margin: max within-scene SAD/pixel well under the
    // threshold, min cut SAD/pixel well over it
    val Array(maxDrift, minCut) = classified
      .agg(max(when(!col("isCut"), col("sad") / col("wh"))),
        min(when(col("isCut"), col("sad") / col("wh"))))
      .collect().head.toSeq.map(_.asInstanceOf[Double]).toArray
    assert(maxDrift < 25.0, s"within-scene drift too hot: $maxDrift/pixel")
    assert(minCut > 100.0, s"cut spike too cold: $minCut/pixel")
  }
}
