package graft.functions

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** IVF (inverted-file) approximate nearest neighbor over an embedding
  * column — the trained-partition counterpart to the hash-based
  * [[Similarity.lshBucketPairs]] (LLM-pipeline extension; the reference
  * has no vector surface).
  *
  * Shape: KMeans (Spark MLlib, seeded — deterministic) learns
  * `nCentroids` coarse cells; every corpus vector is assigned to its
  * nearest cell (one broadcast of the centroid matrix, one scan); a query
  * probes only its `nProbe` nearest cells. At 100 TB the corpus scan
  * prunes to nProbe/nCentroids of the data per query — the IVF recall/
  * throughput dial — and the assignment is a map-only pass reusable
  * across queries (persist the (vec_id, cell) table).
  *
  * Exactness anchor: with `nProbe == nCentroids` the probe filter admits
  * every cell, and results are IDENTICAL to [[Similarity.bruteForceTopK]]
  * (same sequential-index double dot kernel) — spec-enforced, so the
  * approximation is a pure subset relaxation, not a different scorer.
  */
object Ivf {

  import Similarity.Vec

  private def toVecs(emb: DataFrame): Dataset[Vec] = Similarity.toVecs(emb)

  private def dot(a: Array[Double], b: Array[Double]): Double = {
    var i = 0; var s = 0.0
    while (i < a.length) { s += a(i) * b(i); i += 1 }
    s
  }

  private def sqDist(a: Array[Double], b: Array[Double]): Double = {
    var i = 0; var s = 0.0
    while (i < b.length) { val d = a(i) - b(i); s += d * d; i += 1 }
    s
  }

  /** Train the coarse quantizer: seeded KMeans over the embeddings.
    * Returns the centroid matrix (nCentroids × dim).
    */
  def train(emb: DataFrame, nCentroids: Int, seed: Long = 42L,
      maxIter: Int = 20): Array[Array[Double]] = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.linalg.Vectors
    // explicit array<double> cast: exact for the FLOAT[] vintage, and a
    // Seq[Float] udf here would have let Spark SILENTLY downcast a
    // DOUBLE[] vintage at the coercion boundary
    val toFeature = udf((a: Seq[Double]) => Vectors.dense(a.toArray))
    val df = emb.select(
      toFeature(col("embedding").cast("array<double>")).as("features"))
    val model = new KMeans().setK(nCentroids).setSeed(seed)
      .setMaxIter(maxIter).fit(df)
    model.clusterCenters.map(_.toArray)
  }

  /** Nearest-centroid cell per vector: one broadcast + one map-only scan.
    * Persist the result to amortize across query batches.
    */
  def assign(emb: DataFrame, centroids: Array[Array[Double]]): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val cb = spark.sparkContext.broadcast(centroids)
    toVecs(emb).map { v =>
      val cs = cb.value
      var best = 0; var bestD = Double.MaxValue
      var c = 0
      while (c < cs.length) {
        val d = sqDist(cs(c), v.v)
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      (v.id, best)
    }.toDF("vec_id", "cell")
  }

  /** Per-query probe set: the nProbe nearest centroid cells (tiny —
    * queries × nCentroids distances on the driver). Shared with the
    * IVF-PQ composition in [[Pq.searchTopKIvf]].
    */
  private[functions] def probeSets(queries: Array[Vec],
      centroids: Array[Array[Double]], nProbe: Int): Map[Long, Set[Int]] =
    queries.map { q =>
      q.id -> centroids.indices
        .sortBy(c => sqDist(centroids(c), q.v))
        .take(math.min(nProbe, centroids.length)).toSet
    }.toMap

  /** Cosine top-k for each query row (selected by `queryPred`), probing
    * each query's `nProbe` nearest cells only. Output
    * (q_id, rk, neighbor_id, cos) — same schema as the brute-force
    * baseline.
    *
    * Convenience form: recomputes the cell assignment inline (one corpus
    * scan). For repeated query batches use the overload taking a
    * persisted `assigned` table from [[assign]] — one assignment feeds
    * every batch.
    */
  def searchTopK(emb: DataFrame, queryPred: org.apache.spark.sql.Column,
      k: Int, centroids: Array[Array[Double]], nProbe: Int): DataFrame =
    searchTopK(emb, assign(emb, centroids), queryPred, k, centroids, nProbe)

  /** Artifact-reusing form: `assigned` is a (vec_id, cell) table from
    * [[assign]] — persist it once and amortize the corpus scan across
    * query batches (the 100 TB shape: assignment is the expensive pass,
    * probes are cheap).
    */
  def searchTopK(emb: DataFrame, assigned: DataFrame,
      queryPred: org.apache.spark.sql.Column, k: Int,
      centroids: Array[Array[Double]], nProbe: Int): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val corpus = toVecs(emb)
    val queries = toVecs(emb.filter(queryPred)).collect()
    val probes = probeSets(queries, centroids, nProbe)
    val qb = spark.sparkContext.broadcast(queries)
    val pb = spark.sparkContext.broadcast(probes)
    val cells = assigned.select(col("vec_id"), col("cell")).as[(Long, Int)]
    val scored = corpus
      .joinWith(cells, corpus("id") === cells("vec_id"))
      .map { case (v, (_, cell)) => (v, cell) }
      .mapPartitions { it =>
        val qs = qb.value
        val pr = pb.value
        it.flatMap { case (c, cell) =>
          qs.iterator
            .filter(q => q.id != c.id && pr(q.id).contains(cell))
            .map(q => (q.id, c.id, Similarity.cosine(dot(q.v, c.v), q.norm, c.norm)))
        }
      }.toDF("q_id", "neighbor_id", "cos")
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    scored.withColumn("rk", row_number().over(w)).filter(col("rk") <= k)
      .select(col("q_id"), col("rk"), col("neighbor_id"), col("cos"))
  }
}
