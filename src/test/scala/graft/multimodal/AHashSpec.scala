package graft.multimodal

import graft.SparkSpec

/** Average-hash laws: hand-computed bits on a half/half image, the
  * perceptual invariance that motivates the hash (NN-resized image
  * hashes identically), and byte-different-but-visually-identical
  * payloads colliding.
  */
class AHashSpec extends SparkSpec {
  import SparkSpec.spark.implicits._

  private def media(rows: (Long, Array[Byte])*) =
    rows.toSeq.toDF("media_id", "payload")

  // gray pixel: r=g=b=v → integer luma exactly v
  private def gray(v: Int): Int = (v << 16) | (v << 8) | v

  test("hand-computed bits: bright right half sets x>=4 columns") {
    val bmp = MediaCodecs.encodeBmp(8, 8,
      (x, _) => gray(if (x < 4) 10 else 200))
    val out = Multimodal.imageAHash(media(1L -> bmp)).collect()
    assert(out.length == 1)
    // mean = (4·10 + 4·200)·8 / 64 = 105; bits set where luma 200 > 105:
    // per row 0xF0, rows 0–3 in lo, 4–7 in hi
    val expected = 0xF0F0F0F0L
    assert(out(0).ahashLo == expected, s"lo=${out(0).ahashLo.toHexString}")
    assert(out(0).ahashHi == expected, s"hi=${out(0).ahashHi.toHexString}")
  }

  test("flat image hashes to zero (nothing exceeds the mean)") {
    val bmp = MediaCodecs.encodeBmp(8, 8, (_, _) => gray(77))
    val out = Multimodal.imageAHash(media(1L -> bmp)).collect()(0)
    assert(out.ahashHi == 0L && out.ahashLo == 0L)
  }

  test("NN-resized image hashes identically (perceptual invariance)") {
    val bmp = MediaCodecs.encodeBmp(8, 8,
      (x, y) => gray(((x * 31 + y * 17) % 200) + 20))
    val base = Multimodal.imageAHash(media(5L -> bmp)).collect()(0)
    val up = Multimodal.imageAHash(
      Multimodal.resizeImages(media(5L -> bmp), num = 2, den = 1))
      .collect()(0)
    assert((up.ahashHi, up.ahashLo) == (base.ahashHi, base.ahashLo),
      "2x NN upscale must not change the average hash")
  }

  test("perceptualDupPairs: resized copy pairs with its source; " +
      "triple groups expand to all sorted pairs") {
    val a = MediaCodecs.encodeBmp(8, 8, (x, y) => gray((x * 31 + y) % 250))
    val aCopy = MediaCodecs.encodeBmp(16, 16,
      (x, y) => gray(((x / 2) * 31 + (y / 2)) % 250)) // NN 2x of a
    // row gradient: bright BOTTOM half → row-wise bit layout, distinct
    // from the group's column-wise one (a column gradient would
    // organically collide — same x>=4 pattern)
    val other = MediaCodecs.encodeBmp(8, 8, (_, y) => gray(y * 30))
    val out = Multimodal.perceptualDupPairs(
      media(1L -> a, 7L -> aCopy, 3L -> a, 9L -> other))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // 1, 3, 7 share the hash → pairs (1,3) (1,7) (3,7); 9 is alone
    assert(out == Set((1L, 3L), (1L, 7L), (3L, 7L)))
  }

  test("perceptualNearDupPairs: pigeonhole band finds every pair within " +
      "the Hamming budget, exactly (brute-force cross-check)") {
    // 6 images: a base, a near-twin (one pixel region bumped), a far
    // image, plus three gradient variants — compare the banded plan's
    // pairs against brute-force distances over the hashes
    def img(bump: Int, seed: Int) = MediaCodecs.encodeBmp(8, 8,
      (x, y) => gray((x * 31 + y * 7 + seed +
        (if (bump != 0 && x == 0 && y == 0) bump else 0)) % 250))
    val payloads = Map(
      1L -> img(0, 0), 2L -> img(96, 0), 3L -> img(0, 120),
      4L -> img(0, 40), 5L -> img(96, 40), 6L -> img(0, 200))
    val m = media(payloads.toSeq: _*)
    val maxDist = 6
    val got = Multimodal.perceptualNearDupPairs(m, maxDist,
      maxBucket = Int.MaxValue)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val hashes = Multimodal.imageAHash(m).collect()
      .map(h => h.mediaId -> (h.ahashHi, h.ahashLo)).toMap
    val want = (for {
      a <- hashes.keys; b <- hashes.keys; if a < b
      d = java.lang.Long.bitCount(hashes(a)._1 ^ hashes(b)._1) +
        java.lang.Long.bitCount(hashes(a)._2 ^ hashes(b)._2)
      if d <= maxDist
    } yield (a, b, d)).toSet
    assert(got == want, s"banded=$got brute=$want")
    // the planted twin must be among them (a one-cell bump is a few bits)
    assert(want.exists(p => p._1 == 1L && p._2 == 2L),
      "twin (1,2) must be within the Hamming budget")
  }

  test("perceptualNearDupPairsWithDrops: over-cap band buckets are " +
      "quarantined, not silently discarded") {
    // 8 byte-distinct encodings of the SAME pixels: every band bucket has
    // 8 members, so a cap of 4 must route all of them to the drop side
    def img(f: Int) = MediaCodecs.encodePng(8, 8,
      (x, y) => gray((x * 31 + y * 7) % 250), filterType = f % 5)
    val rows = (1L to 8L).map(i =>
      i -> (if (i <= 5) img(i.toInt - 1)
            else MediaCodecs.encodeBmp(8, 8,
              (x, y) => gray((x * 31 + y * 7) % 250))))
    val m = media(rows: _*)
    val maxDist = 2
    val sp = Multimodal.perceptualNearDupPairsWithDrops(m, maxDist,
      maxBucket = 4)
    assert(sp.pairs.count() == 0L, "capped buckets must emit no pairs")
    val dropped = sp.droppedBuckets.collect()
    assert(dropped.nonEmpty, "over-cap buckets must surface on the drop side")
    // every dropped bucket reports its full membership
    assert(dropped.forall(_.getAs[Long]("members") == 8L),
      dropped.mkString(","))
    // all maxDist+1 bands of the single hash value are over-cap
    assert(dropped.length == maxDist + 1, dropped.mkString(","))
    // uncapped, the same corpus yields all 28 pairs at distance 0
    val full = Multimodal.perceptualNearDupPairsWithDrops(m, maxDist,
      maxBucket = Int.MaxValue)
    assert(full.pairs.count() == 28L)
    assert(full.droppedBuckets.count() == 0L)
  }

  test("halves stay in unsigned 32-bit range") {
    val bmp = MediaCodecs.encodeBmp(9, 11,
      (x, y) => gray((x * 23 + y * 29) % 256))
    val out = Multimodal.imageAHash(media(2L -> bmp)).collect()(0)
    assert(out.ahashHi >= 0L && out.ahashHi < (1L << 32))
    assert(out.ahashLo >= 0L && out.ahashLo < (1L << 32))
  }
}
