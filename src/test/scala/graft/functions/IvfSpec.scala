package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.SparkSpec.spark.implicits._

/** IVF ANN semantics: full-probe search must equal brute force exactly
  * (same kernel, probe filter admits everything), and reduced probes must
  * trade recall deterministically (seeded KMeans).
  */
class IvfSpec extends SparkSpec {

  // deterministic clustered corpus: 4 latent clusters in 16 dims
  private lazy val emb = (0 until 120).map { i =>
    val cluster = i % 4
    (i.toLong, Array.tabulate(16)(d =>
      (math.sin(cluster * 2.1 + d * 0.37) + 0.05 * math.sin(i * 1.7 + d)).toFloat))
  }.toSeq.toDF("vec_id", "embedding")

  private def resultSet(df: org.apache.spark.sql.DataFrame) =
    df.select(col("q_id"), col("rk"), col("neighbor_id"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet

  test("full-probe IVF equals brute force exactly") {
    val centroids = Ivf.train(emb, nCentroids = 4)
    val ivf = Ivf.searchTopK(emb, col("vec_id") < 5, k = 10,
      centroids, nProbe = 4)
    val brute = Similarity.bruteForceTopK(emb, col("vec_id") < 5, k = 10)
    assert(resultSet(ivf) == resultSet(brute))
  }

  test("single-probe IVF keeps high recall on clustered data") {
    val centroids = Ivf.train(emb, nCentroids = 4)
    val ivf = resultSet(Ivf.searchTopK(emb, col("vec_id") < 5, k = 10,
      centroids, nProbe = 1)).map(t => (t._1, t._3))
    val brute = resultSet(Similarity.bruteForceTopK(emb, col("vec_id") < 5,
      k = 10)).map(t => (t._1, t._3))
    val recall = ivf.intersect(brute).size.toDouble / brute.size
    assert(recall >= 0.8,
      s"nearest neighbors live in the query's own cluster; recall was $recall")
    // and a single probe returns enough candidates to fill k for each query
    assert(ivf.groupBy(_._1).forall(_._2.size == 10))
  }

  test("cell assignment is a total partition of the corpus") {
    val centroids = Ivf.train(emb, nCentroids = 4)
    val assigned = Ivf.assign(emb, centroids)
    assert(assigned.count() == 120)
    assert(assigned.select(col("cell")).distinct().count() <= 4)
    // deterministic: re-running yields the identical assignment
    val a1 = assigned.collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    val a2 = Ivf.assign(emb, centroids).collect()
      .map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(a1 == a2)
  }
}
