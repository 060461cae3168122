package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.SparkSpec.spark.implicits._

/** PQ semantics: when reconstruction is exact (every subvector is a
  * codebook centroid) ADC cosine equals brute-force cosine; on clustered
  * data quantization keeps high recall; codes are the claimed m bytes
  * and encoding is deterministic.
  */
class PqSpec extends SparkSpec {

  // corpus drawn from a small product set: subspace j of every vector is
  // one of 4 patterns — so k=4 centroids per subspace can reconstruct
  // the corpus EXACTLY and the ADC anchor is bit-tight
  private lazy val productEmb = (0 until 64).map { i =>
    (i.toLong, Array.tabulate(16) { d =>
      val j = d / 4 // subspace of width 4
      // 4 distinct patterns in EVERY subspace (j % 3: 64 ids only carry
      // 6 pattern bits, so subspace 3 reuses subspace 0's selector)
      val pattern = (i >> (2 * (j % 3))) & 3
      (math.sin(pattern * 1.9 + d * 0.53) + 1.5).toFloat
    })
  }.toSeq.toDF("vec_id", "embedding")

  // clustered corpus, same shape as IvfSpec's but with intra-blob noise
  // large enough (0.12, was 0.05) that brute-force top-5 neighbors are
  // decisively intra-blob: at 0.05 a few top-5 pairs were cross-blob
  // near-ties, putting a DATA ceiling (~0.78) on single-probe recall
  // that no quantizer can beat — the old threshold only held because
  // MLlib's particular local optimum ranked one fewer tie into its
  // top-5. The test's intent is "quantization keeps recall", not a
  // seed lottery among equal-cost codebooks
  private lazy val clusteredEmb = (0 until 120).map { i =>
    val cluster = i % 4
    (i.toLong, Array.tabulate(16)(d =>
      (math.sin(cluster * 2.1 + d * 0.37) + 0.12 * math.sin(i * 1.7 + d)).toFloat))
  }.toSeq.toDF("vec_id", "embedding")

  private def topSet(df: org.apache.spark.sql.DataFrame) =
    df.select(col("q_id"), col("neighbor_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("exact-reconstruction anchor: ADC cosine == brute-force cosine") {
    val cb = Pq.train(productEmb, m = 4, k = 4, maxIter = 40)
    val pq = Pq.searchTopK(productEmb, col("vec_id") < 4, k = 8, cb)
      .collect().map(r => (r.getLong(0), r.getLong(2)) -> r.getDouble(3)).toMap
    val brute = Similarity.bruteForceTopK(productEmb, col("vec_id") < 4, k = 8)
      .collect().map(r => (r.getLong(0), r.getLong(2)) -> r.getDouble(3)).toMap
    // KMeans with k = #distinct patterns recovers the patterns, so the
    // quantized scores match the exact ones to float tolerance
    assert(pq.keySet == brute.keySet)
    pq.foreach { case (key, c) =>
      assert(math.abs(c - brute(key)) < 1e-6, s"cos mismatch at $key")
    }
  }

  test("codes are m bytes; encode is deterministic; recon_norm positive") {
    val cb = Pq.train(clusteredEmb, m = 4, k = 8)
    val enc = Pq.encode(clusteredEmb, cb)
    val rows = enc.collect()
    assert(rows.length == 120)
    assert(rows.forall(_.getAs[Array[Byte]]("code").length == 4))
    assert(rows.forall(_.getDouble(2) > 0))
    val again = Pq.encode(clusteredEmb, cb).collect()
      .map(r => r.getLong(0) -> r.getAs[Array[Byte]]("code").toSeq).toMap
    assert(rows.forall(r =>
      again(r.getLong(0)) == r.getAs[Array[Byte]]("code").toSeq))
  }

  test("quantized search keeps high recall on clustered data") {
    val cb = Pq.train(clusteredEmb, m = 4, k = 8)
    val pq = topSet(Pq.searchTopK(clusteredEmb, col("vec_id") < 5, k = 10, cb))
    val brute = topSet(
      Similarity.bruteForceTopK(clusteredEmb, col("vec_id") < 5, k = 10))
    val recall = pq.intersect(brute).size.toDouble / brute.size
    assert(recall >= 0.8, s"recall was $recall")
  }

  test("IVF-PQ with full probes equals plain PQ; single probe keeps recall") {
    val cb = Pq.train(clusteredEmb, m = 4, k = 8)
    val coarse = Ivf.train(clusteredEmb, nCentroids = 4)
    val full = topSet(Pq.searchTopKIvf(clusteredEmb, col("vec_id") < 5,
      k = 10, cb, coarse, nProbe = 4))
    val plain = topSet(Pq.searchTopK(clusteredEmb, col("vec_id") < 5, k = 10, cb))
    assert(full == plain)
    val one = topSet(Pq.searchTopKIvf(clusteredEmb, col("vec_id") < 5,
      k = 10, cb, coarse, nProbe = 1))
    val brute = topSet(
      Similarity.bruteForceTopK(clusteredEmb, col("vec_id") < 5, k = 10))
    val recall = one.intersect(brute).size.toDouble / brute.size
    assert(recall >= 0.8, s"recall was $recall")
  }

  test("zero-norm vectors score 0.0, never NaN (NaN would sort first)") {
    val withZero = clusteredEmb
      .union(Seq((999L, Array.fill(16)(0f))).toDF("vec_id", "embedding"))
    val cb = Pq.train(clusteredEmb, m = 4, k = 8)
    // zero vector as corpus row: PQ quantizes it to the nearest (nonzero)
    // centroids, so its ADC cos is merely finite — but never NaN
    val asCorpus = Pq.searchTopK(withZero, col("vec_id") < 2, k = 200, cb)
      .collect()
    assert(asCorpus.forall(r => !r.getDouble(3).isNaN))
    // zero vector as the QUERY: all neighbors 0.0, top-k still k rows
    val asQuery = Pq.searchTopK(withZero, col("vec_id") === 999L, k = 5, cb)
      .collect()
    assert(asQuery.length == 5)
    assert(asQuery.forall(r => r.getDouble(3) == 0.0))
    // exact scorer agrees on the guard
    val brute = Similarity.bruteForceTopK(withZero, col("vec_id") === 999L, k = 5)
      .collect()
    assert(brute.forall(r => !r.getDouble(3).isNaN && r.getDouble(3) == 0.0))
  }

  test("one encode + one assign feed two query batches identically") {
    val cb = Pq.train(clusteredEmb, m = 4, k = 8)
    val coarse = Ivf.train(clusteredEmb, nCentroids = 4)
    val codes = Pq.encode(clusteredEmb, cb).persist()
    val assigned = Ivf.assign(clusteredEmb, coarse).persist()
    try {
      for (pred <- Seq(col("vec_id") < 5,
          col("vec_id") >= 50 && col("vec_id") < 55)) {
        val reused = topSet(Pq.searchTopKIvf(clusteredEmb, codes, assigned,
          pred, k = 10, cb, coarse, nProbe = 4))
        val fresh = topSet(Pq.searchTopKIvf(clusteredEmb, pred,
          k = 10, cb, coarse, nProbe = 4))
        assert(reused == fresh)
        val ivfReused = topSet(Ivf.searchTopK(clusteredEmb, assigned, pred,
          k = 10, coarse, nProbe = 4))
        val ivfFresh = topSet(Ivf.searchTopK(clusteredEmb, pred,
          k = 10, coarse, nProbe = 4))
        assert(ivfReused == ivfFresh)
      }
    } finally { codes.unpersist(); assigned.unpersist() }
  }

  test("train on a deterministic hash-sample still covers the corpus") {
    val cb = Pq.train(clusteredEmb, m = 4, k = 4, trainSampleBp = 5000)
    val enc = Pq.encode(clusteredEmb, cb)
    assert(enc.count() == 120)
    // every subspace uses more than one centroid (the sample saw the
    // cluster structure)
    val spread = enc.select(col("code")).collect()
      .map(_.getAs[Array[Byte]](0).toSeq).distinct.size
    assert(spread > 1)
  }
}
