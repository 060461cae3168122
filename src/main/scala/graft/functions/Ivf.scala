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

  private[functions] def sqDist(a: Array[Double], b: Array[Double]): Double = {
    var i = 0; var s = 0.0
    while (i < b.length) { val d = a(i) - b(i); s += d * d; i += 1 }
    s
  }

  /** Training-set ceiling for the driver-local Lloyd path: up to this
    * many vectors, quantizer training runs as plain seeded k-means++ +
    * Lloyd on the COLLECTED sample — the faiss-style design. A coarse
    * quantizer or PQ codebook trains on a bounded sample even at 100 TB
    * (the caller samples; [[Pq.train]] has `trainSampleBp`), and running
    * a DISTRIBUTED KMeans there costs ~maxIter scheduled Spark jobs for
    * work one core finishes in milliseconds — measured seconds of pure
    * scheduling overhead per training call on the bench. Above the
    * ceiling, distributed MLlib KMeans takes over unchanged.
    */
  private[functions] val LocalTrainMax = 131072

  /** Train the coarse quantizer: seeded KMeans over the embeddings.
    * Returns the centroid matrix (nCentroids × dim).
    */
  def train(emb: DataFrame, nCentroids: Int, seed: Long = 42L,
      maxIter: Int = 20): Array[Array[Double]] = {
    // one job either way: pull at most ceiling+1 rows; overflow ⇒ the
    // distributed path (which re-plans the full scan)
    val sample = Similarity.vecRows(emb).limit(LocalTrainMax + 1).collect()
    if (sample.length <= LocalTrainMax)
      // sorted by id: collect order is partition-dependent, the sort
      // makes training bit-reproducible across runs/cluster layouts
      localLloyd(sample.sortBy(_._1).map(_._2), nCentroids, seed, maxIter)
    else {
      import org.apache.spark.ml.clustering.KMeans
      import org.apache.spark.ml.linalg.Vectors
      // explicit array<double> cast: exact for the FLOAT[] vintage, and a
      // Seq[Double] udf would have let Spark SILENTLY downcast a
      // DOUBLE[] vintage at the coercion boundary with Seq[Float]
      val toFeature = udf((a: Seq[Double]) => Vectors.dense(a.toArray))
      val df = emb.select(
        toFeature(col("embedding").cast("array<double>")).as("features"))
      val model = new KMeans().setK(nCentroids).setSeed(seed)
        .setMaxIter(maxIter).fit(df)
      model.clusterCenters.map(_.toArray)
    }
  }

  /** Seeded k-means++ init + `maxIter` Lloyd rounds on a local sample,
    * best of [[LocalRestarts]] seeded restarts by final quantization
    * cost (a single restart's local optimum measurably hurts recall on
    * tightly-blobbed data; restarts are trivial at sample scale).
    * Deterministic for a fixed input order; returns FEWER than k centers
    * when the data has fewer distinct points (matching MLlib's
    * contract). Empty clusters keep their previous center.
    */
  private[functions] def localLloyd(data: Array[Array[Double]], k: Int,
      seed: Long, maxIter: Int): Array[Array[Double]] = {
    require(data.nonEmpty, "k-means needs a non-empty training set")
    // one restart costs ~n·k·dim·maxIter mul-adds; bound TOTAL restart
    // work so the local path stays sub-second right up to the collect
    // ceiling instead of hitting a serial-driver latency cliff (131k
    // vectors × k=256 × dim=64 × 20 iters ≈ 4e10 per restart)
    val work = data.length.toDouble * k * data(0).length * math.max(maxIter, 1)
    val restarts = math.max(1,
      math.min(LocalRestarts, (RestartWorkBudget / math.max(work, 1.0)).toInt))
    var best: Array[Array[Double]] = null
    var bestCost = Double.MaxValue
    var r = 0
    while (r < restarts) {
      val c = localLloydOnce(data, k, seed + r * 1000003L, maxIter)
      var cost = 0.0
      var i = 0
      while (i < data.length) {
        var bd = Double.MaxValue
        var ci = 0
        while (ci < c.length) {
          val d = sqDist(c(ci), data(i)); if (d < bd) bd = d; ci += 1
        }
        cost += bd; i += 1
      }
      if (cost < bestCost) { bestCost = cost; best = c }
      r += 1
    }
    best
  }

  private val LocalRestarts = 10
  private val RestartWorkBudget = 2e9

  private def localLloydOnce(data: Array[Array[Double]], k: Int,
      seed: Long, maxIter: Int): Array[Array[Double]] = {
    require(data.nonEmpty, "k-means needs a non-empty training set")
    require(k >= 1, s"k-means needs k >= 1, got $k")
    val n = data.length
    val dim = data(0).length
    val rng = new scala.util.Random(seed)
    val centers = scala.collection.mutable.ArrayBuffer[Array[Double]]()
    centers += data(rng.nextInt(n)).clone()
    val d2 = Array.fill(n)(Double.MaxValue)
    var exhausted = false
    while (centers.size < k && !exhausted) {
      val c = centers.last
      var tot = 0.0
      var i = 0
      while (i < n) {
        val dist = sqDist(c, data(i))
        if (dist < d2(i)) d2(i) = dist
        tot += d2(i); i += 1
      }
      if (tot == 0.0) exhausted = true // every point is a center already
      else {
        // GREEDY k-means++ (the sklearn refinement): draw several
        // D²-weighted candidates, keep the one minimizing the resulting
        // total cost — plain single-draw init lands in measurably worse
        // local optima (recall 0.72 vs 0.9+ on the clustered-data spec)
        val tries = 4 + 2 * (32 - Integer.numberOfLeadingZeros(math.max(k - 1, 1)))
        var bestJ = -1
        var bestCost = Double.MaxValue
        var t = 0
        while (t < tries) {
          var r = rng.nextDouble() * tot
          var j = 0
          while (j < n - 1 && r >= d2(j)) { r -= d2(j); j += 1 }
          // land on a positive-weight point (r can stop on a duplicate)
          while (d2(j) == 0.0) j = (j + 1) % n
          var cost = 0.0
          var i = 0
          while (i < n) {
            cost += math.min(d2(i), sqDist(data(j), data(i))); i += 1
          }
          if (cost < bestCost) { bestCost = cost; bestJ = j }
          t += 1
        }
        // bestJ survives -1 only when every candidate cost was
        // non-finite — NaN/Inf components; fail with a diagnosis, not
        // an ArrayIndexOutOfBounds deep inside training
        require(bestJ >= 0,
          "k-means cost is non-finite — embedding components must be finite")
        centers += data(bestJ).clone()
      }
    }
    val cArr = centers.toArray
    var it = 0
    while (it < maxIter) {
      val sums = Array.ofDim[Double](cArr.length, dim)
      val cnt = new Array[Long](cArr.length)
      var i = 0
      while (i < n) {
        var best = 0; var bd = Double.MaxValue; var c = 0
        while (c < cArr.length) {
          val dd = sqDist(cArr(c), data(i))
          if (dd < bd) { bd = dd; best = c }
          c += 1
        }
        cnt(best) += 1
        var x = 0
        while (x < dim) { sums(best)(x) += data(i)(x); x += 1 }
        i += 1
      }
      var c = 0
      while (c < cArr.length) {
        if (cnt(c) > 0) {
          var x = 0
          while (x < dim) { cArr(c)(x) = sums(c)(x) / cnt(c); x += 1 }
        }
        c += 1
      }
      it += 1
    }
    cArr
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
