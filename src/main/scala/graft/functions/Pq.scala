package graft.functions

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame, Dataset}

/** Product quantization (PQ) for approximate nearest neighbor over an
  * embedding column — the memory-compression counterpart to the
  * cell-pruning [[Ivf]] (LLM-pipeline extension; the reference has no
  * vector surface).
  *
  * A d-dim float vector (4d bytes) is split into `m` contiguous
  * subvectors; each subspace learns `k ≤ 256` centroids (seeded KMeans —
  * deterministic), and a vector is stored as the m byte-sized centroid
  * indices of its subvectors: 3 KB of float32 at d=768 becomes m bytes
  * (8–96). Search scores a query against CODES via asymmetric distance
  * computation (ADC): one m×k table of per-subspace partial dot products
  * per query, then each corpus code costs m table lookups — no float
  * vector is ever materialized on the scan side.
  *
  * At 100 TB this is the difference between "embeddings don't fit" and
  * an in-memory scan: the code table is ~400× smaller than the raw
  * embeddings, the encode pass is map-only behind one codebook
  * broadcast, and the ADC scan composes with [[Ivf.assign]] cells
  * (IVF-PQ: probe prunes the rows, PQ compresses what's scanned).
  * Training runs m small KMeans fits; production trains on a
  * deterministic [[Curation.hashSample]] of the corpus rather than the
  * full pass (the codebooks only need the distribution, not every row).
  *
  * Exactness anchor (spec-enforced, like [[Ivf]]'s full-probe anchor):
  * when every corpus subvector IS a centroid of its subspace codebook,
  * reconstruction is exact and ADC cosine equals brute-force cosine —
  * the approximation is purely quantization error, not a different
  * scorer.
  */
object Pq {

  import Similarity.Vec

  /** Per-subspace centroid tables: `centroids(j)(c)` is the c-th centroid
    * of subspace j (`dsub = dim / m` doubles each).
    */
  final case class Codebooks(m: Int, dsub: Int,
      centroids: Array[Array[Array[Double]]]) {
    require(centroids.length == m)

    /** Largest per-subspace codebook size (KMeans may return fewer than
      * the requested k centers when a subspace has fewer distinct
      * subvectors — loops must use `centroids(j).length`, not this).
      */
    def k: Int = centroids.map(_.length).max

    /** Nearest-centroid index of `v`'s j-th subvector. */
    def encodeSub(v: Array[Double], j: Int): Int = {
      val cs = centroids(j)
      val off = j * dsub
      var best = 0; var bestD = Double.MaxValue
      var c = 0
      while (c < cs.length) {
        var i = 0; var d = 0.0
        while (i < dsub) {
          val x = cs(c)(i) - v(off + i); d += x * x; i += 1
        }
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      best
    }

    /** Reconstruction: concatenated centroids of a code. */
    def reconstruct(code: Array[Byte]): Array[Double] = {
      val out = new Array[Double](m * dsub)
      var j = 0
      while (j < m) {
        System.arraycopy(centroids(j)(code(j) & 0xff), 0, out, j * dsub, dsub)
        j += 1
      }
      out
    }
  }

  private def toVecs(emb: DataFrame): Dataset[Vec] = Similarity.toVecs(emb)

  /** Train per-subspace codebooks: m seeded KMeans fits over the
    * subvector slices. `trainSample` (basis points) optionally trains on
    * a deterministic hash-sample of the corpus — the at-scale default.
    */
  def train(emb: DataFrame, m: Int, k: Int, seed: Long = 42L,
      maxIter: Int = 20, trainSampleBp: Int = 10000): Codebooks = {
    require(k <= 256, s"PQ codes are one byte per subspace: k=$k > 256")
    val base = if (trainSampleBp >= 10000) emb
      else Curation.hashSample(emb, col("vec_id"), "pqtrain", lit(trainSampleBp))
    // sample-train path (see Ivf.LocalTrainMax): the m per-subspace
    // codebooks train on ONE collected sample, sliced locally — m
    // distributed KMeans fits over a bounded sample were pure
    // job-scheduling overhead
    val sample = Similarity.vecRows(base).limit(Ivf.LocalTrainMax + 1).collect()
    require(sample.nonEmpty, "PQ training needs a non-empty corpus")
    if (sample.length <= Ivf.LocalTrainMax) {
      val vecs = sample.sortBy(_._1).map(_._2)
      val dim = vecs(0).length
      require(dim % m == 0, s"dim $dim not divisible by m=$m")
      val dsub = dim / m
      val cbs = (0 until m).map { j =>
        val slice = vecs.map(v =>
          java.util.Arrays.copyOfRange(v, j * dsub, (j + 1) * dsub))
        Ivf.localLloyd(slice, k, seed + j, maxIter)
      }.toArray
      Codebooks(m, dsub, cbs)
    } else {
      import org.apache.spark.ml.clustering.KMeans
      import org.apache.spark.ml.linalg.Vectors
      val dim = base.select(size(col("embedding"))).head().getInt(0)
      require(dim % m == 0, s"dim $dim not divisible by m=$m")
      val dsub = dim / m
      // explicit array<double> cast: exact for FLOAT[], and a Seq[Float]
      // udf would let Spark silently downcast a DOUBLE[] vintage
      val sliceUdf = udf((a: Seq[Double], off: Int) =>
        Vectors.dense(a.slice(off, off + dsub).toArray))
      val cached = base
        .select(col("embedding").cast("array<double>").as("embedding"))
        .persist()
      try {
        val cbs = (0 until m).map { j =>
          val df = cached.select(sliceUdf(col("embedding"), lit(j * dsub)).as("features"))
          val model = new KMeans().setK(k).setSeed(seed + j).setMaxIter(maxIter)
            .fit(df)
          model.clusterCenters.map(_.toArray)
        }.toArray
        Codebooks(m, dsub, cbs)
      } finally cached.unpersist()
    }
  }

  /** Map-only encode behind one codebook broadcast:
    * (vec_id, code m bytes, recon_norm) — the reconstruction norm is
    * precomputed so cosine needs no per-row decode at search time.
    */
  def encode(emb: DataFrame, cb: Codebooks): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(cb)
    toVecs(emb).map { v =>
      val b = bc.value
      // shorter would crash in encodeSub, but LONGER would silently
      // encode a truncated prefix — both are data errors, both loud
      require(v.v.length == b.m * b.dsub,
        s"cannot encode a ${v.v.length}-d vector with ${b.m}x${b.dsub}-d " +
          "codebooks — embedding dimension must match the quantizer's")
      val code = new Array[Byte](b.m)
      var j = 0
      while (j < b.m) { code(j) = b.encodeSub(v.v, j).toByte; j += 1 }
      val r = b.reconstruct(code)
      var i = 0; var n = 0.0
      while (i < r.length) { n += r(i) * r(i); i += 1 }
      (v.id, code, math.sqrt(n))
    }.toDF("vec_id", "code", "recon_norm")
  }

  /** [[encode]] fused with the coarse [[Ivf.assign]] in ONE map-only
    * pass behind two broadcasts: (vec_id, code, recon_norm, cell).
    * One scan of the delta and no join — and structurally immune to
    * the duplicate-id cross-product a vec_id join of two separate
    * derivations would produce (each input row yields exactly one
    * output row, its code and cell computed from the SAME embedding).
    */
  def encodeAssigned(emb: DataFrame, cb: Codebooks,
      centroids: Array[Array[Double]]): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val bcb = spark.sparkContext.broadcast(cb)
    val bcc = spark.sparkContext.broadcast(centroids)
    toVecs(emb).map { v =>
      val b = bcb.value
      require(v.v.length == b.m * b.dsub,
        s"cannot encode a ${v.v.length}-d vector with ${b.m}x${b.dsub}-d " +
          "codebooks — embedding dimension must match the quantizer's")
      val code = new Array[Byte](b.m)
      var j = 0
      while (j < b.m) { code(j) = b.encodeSub(v.v, j).toByte; j += 1 }
      val r = b.reconstruct(code)
      var i = 0; var n = 0.0
      while (i < r.length) { n += r(i) * r(i); i += 1 }
      val cs = bcc.value
      var best = 0; var bestD = Double.MaxValue
      var c = 0
      while (c < cs.length) {
        val d = Ivf.sqDist(cs(c), v.v)
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      (v.id, code, math.sqrt(n), best)
    }.toDF("vec_id", "code", "recon_norm", "cell")
  }

  /** Per-query ADC tables: `table(j)(c)` = dot of the query's j-th
    * subvector with centroid c of subspace j; a code's approximate dot
    * is then m table lookups.
    */
  private[functions] def adcTables(queries: Array[Vec],
      cb: Codebooks): Array[(Long, Double, Array[Array[Double]])] =
    queries.map { q =>
      val t = Array.tabulate(cb.m) { j =>
        val off = j * cb.dsub
        cb.centroids(j).map { cent =>
          var i = 0; var s = 0.0
          while (i < cb.dsub) { s += cent(i) * q.v(off + i); i += 1 }
          s
        }
      }
      (q.id, q.norm, t)
    }

  /** ADC cosine top-k per query row (selected by `queryPred`) over the
    * ENCODED corpus: per query one m×k partial-dot table, per code m
    * lookups. Output (q_id, rk, neighbor_id, cos) — the [[Ivf]]/
    * [[Similarity.bruteForceTopK]] schema, with `cos` the quantized
    * approximation dot(q, x̂)/(|q|·|x̂|).
    */
  def searchTopK(emb: DataFrame, queryPred: Column, k: Int,
      cb: Codebooks): DataFrame =
    searchTopK(emb, encode(emb, cb), queryPred, k, cb)

  /** Artifact-reusing form: `codes` is a persisted (vec_id, code,
    * recon_norm) table from [[encode]] — encode once, serve every query
    * batch from the compressed table (the point of PQ at 100 TB: the
    * float corpus is read exactly once, at encode time).
    */
  def searchTopK(emb: DataFrame, codes: DataFrame, queryPred: Column,
      k: Int, cb: Codebooks): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val queries = toVecs(emb.filter(queryPred)).collect()
    val tables = adcTables(queries, cb)
    val tb = spark.sparkContext.broadcast(tables)
    val scored = codes.select(col("vec_id"), col("code"), col("recon_norm"))
      .as[(Long, Array[Byte], Double)]
      .mapPartitions { it =>
        val ts = tb.value
        it.flatMap { case (id, code, rnorm) =>
          ts.iterator.filter(_._1 != id).map { case (qid, qnorm, t) =>
            var j = 0; var s = 0.0
            while (j < code.length) { s += t(j)(code(j) & 0xff); j += 1 }
            (qid, id, Similarity.cosine(s, qnorm, rnorm))
          }
        }
      }.toDF("q_id", "neighbor_id", "cos")
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    scored.withColumn("rk", row_number().over(w)).filter(col("rk") <= k)
      .select(col("q_id"), col("rk"), col("neighbor_id"), col("cos"))
  }

  /** IVF-PQ: the production ANN shape — [[Ivf.assign]] cells prune WHICH
    * codes a query scores ([[Ivf.probeSets]] per-query nProbe cells), PQ
    * codes compress WHAT is scanned (ADC lookup tables). With
    * `nProbe == nCentroids` the probe filter admits everything and the
    * result is identical to [[searchTopK]] — spec-enforced, so cell
    * pruning is a pure subset relaxation on top of quantization.
    */
  def searchTopKIvf(emb: DataFrame, queryPred: Column, k: Int,
      cb: Codebooks, coarseCentroids: Array[Array[Double]],
      nProbe: Int): DataFrame =
    searchTopKIvf(emb, encode(emb, cb), Ivf.assign(emb, coarseCentroids),
      queryPred, k, cb, coarseCentroids, nProbe)

  /** Artifact-reusing form: `codes` from [[encode]] and `assigned` from
    * [[Ivf.assign]], both persistable — one encode pass + one assignment
    * pass feed every query batch; per batch only the tiny probe/table
    * broadcasts change.
    */
  def searchTopKIvf(emb: DataFrame, codes: DataFrame, assigned: DataFrame,
      queryPred: Column, k: Int, cb: Codebooks,
      coarseCentroids: Array[Array[Double]], nProbe: Int): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val queries = toVecs(emb.filter(queryPred)).collect()
    val probes = Ivf.probeSets(queries, coarseCentroids, nProbe)
    val tables = adcTables(queries, cb)
    val tb = spark.sparkContext.broadcast(tables)
    val pb = spark.sparkContext.broadcast(probes)
    val withCells = codes.join(assigned, "vec_id")
      .select(col("vec_id"), col("code"), col("recon_norm"), col("cell"))
      .as[(Long, Array[Byte], Double, Int)]
    val scored = withCells.mapPartitions { it =>
      val ts = tb.value
      val pr = pb.value
      it.flatMap { case (id, code, rnorm, cell) =>
        ts.iterator
          .filter { case (qid, _, _) => qid != id && pr(qid).contains(cell) }
          .map { case (qid, qnorm, t) =>
            var j = 0; var s = 0.0
            while (j < code.length) { s += t(j)(code(j) & 0xff); j += 1 }
            (qid, id, Similarity.cosine(s, qnorm, rnorm))
          }
      }
    }.toDF("q_id", "neighbor_id", "cos")
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    scored.withColumn("rk", row_number().over(w)).filter(col("rk") <= k)
      .select(col("q_id"), col("rk"), col("neighbor_id"), col("cos"))
  }
}
