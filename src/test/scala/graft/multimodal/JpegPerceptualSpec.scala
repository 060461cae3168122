package graft.multimodal

import graft.SparkSpec

/** Perceptual dedup must catch JPEG — the dominant web-image format — not
  * just the lossless containers. JPEG pixel truth is decoder-approximate
  * (quantization + decoder variance, MediaCodecs scaladoc), so the gate is
  * spec-side and HAMMING-TOLERANT, mirroring ImageIoCodecSpec's
  * bounded-error approach: a BMP and a JPEG of the SAME pixels must land
  * within the Hamming band the pipeline dedups at, while a structurally
  * different image must stay far outside it.
  */
class JpegPerceptualSpec extends SparkSpec {
  import SparkSpec.spark.implicits._

  /** Quantization-tolerant Hamming budget. High-contrast structure
    * survives DCT quantization easily (block luma shifts of a few units
    * against a ~170-unit contrast), so the aHash should move only a few
    * bits; 8 of 64 gives decoder headroom while staying far from the
    * ~32-bit expectation for unrelated images.
    */
  private val Budget = 8

  // high-contrast 8x8-block patterns: the aHash's 8x8 downsample reads one
  // sample per block, so each bit is backed by a full JPEG macro-block of
  // uniform luma — the shape perceptual dedup meets in re-encoded photos
  private def blocks(w: Int)(f: (Int, Int) => Boolean)(x: Int, y: Int): Int = {
    val v = if (f(x / (w / 8), y / (w / 8))) 210 else 40
    (v << 16) | (v << 8) | v
  }

  private val patterns: Seq[(Int, Int) => Boolean] = Seq(
    (bx, _) => bx < 4,              // left/right split
    (bx, by) => (bx + by) % 2 == 0, // checkerboard
    (bx, by) => bx >= by)           // triangle

  test("BMP<->JPEG re-encodes of the same pixels pair within the band; " +
      "unrelated images stay out") {
    val w = 64
    val rows = patterns.zipWithIndex.flatMap { case (p, i) =>
      val id = (i + 1) * 10L
      Seq(
        id -> MediaCodecs.encodeBmp(w, w, blocks(w)(p)),
        (id + 1) -> MediaCodecs.encodeJpeg(w, w, blocks(w)(p)))
    }
    val media = rows.toDF("media_id", "payload")
    val hashes = Multimodal.imageAHash(media).collect()
      .map(h => h.mediaId -> (h.ahashHi, h.ahashLo)).toMap
    assert(hashes.size == rows.size, "every payload must decode and hash")
    def dist(a: Long, b: Long): Int = {
      val (ah, al) = hashes(a); val (bh, bl) = hashes(b)
      java.lang.Long.bitCount(ah ^ bh) + java.lang.Long.bitCount(al ^ bl)
    }
    // each BMP within the band of ITS OWN jpeg re-encode...
    patterns.indices.foreach { i =>
      val id = (i + 1) * 10L
      assert(dist(id, id + 1) <= Budget,
        s"pattern $i: BMP<->JPEG Hamming ${dist(id, id + 1)} > $Budget")
    }
    // ...and far from every OTHER pattern (both encodings)
    for {
      i <- patterns.indices; j <- patterns.indices; if i != j
      a <- Seq((i + 1) * 10L, (i + 1) * 10L + 1)
      b <- Seq((j + 1) * 10L, (j + 1) * 10L + 1)
    } assert(dist(a, b) > Budget,
      s"patterns $i/$j collide at ${dist(a, b)} <= $Budget")

    // end to end through the banded plan: exactly the three planted
    // cross-format pairs, nothing else
    val pairs = Multimodal.perceptualNearDupPairs(media, maxDist = Budget)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = patterns.indices
      .map(i => ((i + 1) * 10L, (i + 1) * 10L + 1)).toSet
    assert(pairs == want, s"got $pairs, want $want")
  }
}
