package graft.functions

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Embedding similarity search (LLM-pipeline extension; the reference has no
  * vector surface — capability superset per BASELINE.json north star).
  *
  * Scale design: the dominant cost is pairwise scoring. The kernels below
  * broadcast one side as primitive `Array[Double]` blocks and scan the other
  * side with `mapPartitions` — a cache-friendly double-precision loop with
  * zero per-pair allocation (the naive `zip_with`+`aggregate` column path
  * allocates two boxed arrays per pair; ~20x slower at 4M pairs). At 100 TB
  * the same kernel runs per broadcast block (query batching) or after an
  * LSH bucket join ([[MinHashLsh]]) — never an unbatched cross join.
  *
  * Determinism: dots accumulate sequentially in double over the array index
  * order, so results are bit-identical to a sequential reference loop
  * regardless of partitioning.
  */
object Similarity {

  final case class Vec(id: Long, v: Array[Double], norm: Double)

  /** Vintage-agnostic typed read of (vec_id, embedding): a FLOAT[]
    * element widens EXACTLY to DOUBLE[], a DOUBLE[] passes through — both
    * yield the same doubles DuckDB's `CAST(x AS DOUBLE)` sees, so every
    * kernel downstream is independent of the testdata's physical element
    * type (Tables.embeddings gates which types can arrive at all).
    */
  private[graft] def vecRows(emb: DataFrame): Dataset[(Long, Array[Double])] = {
    import emb.sparkSession.implicits._
    emb.select(col("vec_id"), col("embedding").cast("array<double>"))
      .as[(Long, Array[Double])]
  }

  private[graft] def toVecs(emb: DataFrame): Dataset[Vec] = {
    import emb.sparkSession.implicits._
    vecRows(emb)
      .map { case (id, v) =>
        var i = 0; var n = 0.0
        while (i < v.length) { val x = v(i); n += x * x; i += 1 }
        Vec(id, v, math.sqrt(n))
      }
  }

  private def dot(a: Array[Double], b: Array[Double]): Double = {
    var i = 0; var s = 0.0
    while (i < a.length) { s += a(i) * b(i); i += 1 }
    s
  }

  /** Cosine from a precomputed dot and the two norms, zero-norm-safe: a
    * zero vector has no direction, so its similarity to anything is 0.0
    * rather than NaN (NaN sorts FIRST under `cos DESC` and would displace
    * real top-k rows). Shared by every scorer ([[bruteForceTopK]],
    * [[Ivf]], [[Pq]]) so the guard is uniform across exact and
    * approximate paths.
    */
  private[functions] def cosine(dot: Double, normA: Double, normB: Double): Double = {
    val d = normA * normB
    if (d == 0.0) 0.0 else dot / d
  }

  /** Hyperplane coordinate (p, d) ∈ [-1, 1): first 15 hex chars of
    * md5("plane:p:d") → 60-bit int, >> 8 → 52-bit (exactly representable
    * in double), / 2^51 - 1. DuckDB replays it verbatim:
    * `(('0x'||substr(md5(s),1,15))::UBIGINT >> 8)::DOUBLE / 2^51 - 1`.
    */
  private[graft] def planeCoord(p: Int, d: Int): Double = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s"plane:$p:$d".getBytes("UTF-8"))
      .map(b => f"${b & 0xff}%02x").mkString.substring(0, 15)
    val h = java.lang.Long.parseLong(hex, 16)
    (h >>> 8).toDouble / 2251799813685248.0 - 1.0
  }

  /** Exact brute-force cosine top-k of `corpus` for each query row
    * (`queryPred` selects queries). Output: (q_id, rk, neighbor_id, cos).
    */
  def bruteForceTopK(emb: DataFrame, queryPred: org.apache.spark.sql.Column,
      k: Int): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val corpus = toVecs(emb)
    val queries = toVecs(emb.filter(queryPred))
    val qb = spark.sparkContext.broadcast(queries.collect())
    val scored = corpus.mapPartitions { it =>
      val qs = qb.value
      it.flatMap { c =>
        qs.iterator.filter(_.id != c.id).map { q =>
          (q.id, c.id, cosine(dot(q.v, c.v), q.norm, c.norm))
        }
      }
    }.toDF("q_id", "neighbor_id", "cos")
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    scored.withColumn("rk", row_number().over(w)).filter(col("rk") <= k)
      .select(col("q_id"), col("rk"), col("neighbor_id"), col("cos"))
  }

  /** All pairs (a_id < b_id) with cosine >= threshold — the exact
    * embedding-near-duplicate baseline, as a distributed blocked pair scan.
    *
    * The corpus is hashed into `nBlocks` blocks; each of the
    * nBlocks·(nBlocks+1)/2 block pairs is scored in its own task, with
    * each block replicated nBlocks times through one shuffle (the
    * unavoidable cost of EXACT all-pairs — total shuffle volume is
    * nBlocks × corpus size, tune nBlocks ≈ cluster parallelism). No
    * driver collect, no broadcast of the full corpus: memory per task is
    * two blocks, so the same plan runs at any corpus size. Scores are
    * sequential-index double dots — bit-identical regardless of which
    * block a vector lands in.
    */
  def nearDupPairs(emb: DataFrame, threshold: Double, nBlocks: Int = 16): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val corpus = toVecs(emb)
    val nB = nBlocks
    val blocks = corpus
      .groupByKey(v => math.floorMod(v.id, nB.toLong).toInt)
      .mapGroups((b, it) => (b, it.toArray))
    // replicate each block to every block-pair task it participates in
    val replicated = blocks.flatMap { case (b, arr) =>
      (0 until nB).iterator.map { o =>
        val (i, j) = if (b <= o) (b, o) else (o, b)
        (i * nB + j, b, arr)
      }
    }
    replicated.groupByKey(_._1).flatMapGroups { (pk, it) =>
      val i = pk / nB
      val j = pk % nB
      val sides = it.toArray
      if (i == j) {
        val arr = sides.head._3
        for {
          x <- arr.iterator
          y <- arr
          if x.id < y.id
          c = cosine(dot(x.v, y.v), x.norm, y.norm)
          if c >= threshold
        } yield (x.id, y.id, c)
      } else {
        val a = sides.find(_._2 == i).map(_._3).getOrElse(Array.empty[Vec])
        val b = sides.find(_._2 == j).map(_._3).getOrElse(Array.empty[Vec])
        for {
          x <- a.iterator
          y <- b
          c = cosine(dot(x.v, y.v), x.norm, y.norm)
          if c >= threshold
        } yield (math.min(x.id, y.id), math.max(x.id, y.id), c)
      }
    }.toDF("a_id", "b_id", "cos")
  }

  /** IVF-style bucketed ANN: assign every vector to its nearest of
    * `nCentroids` deterministic hyperplane buckets (sign of dot with
    * pseudo-random hyperplanes — random-hyperplane LSH), then score only
    * within-bucket pairs. The 100 TB path: the bucket join replaces the
    * cross join; recall is traded via `nPlanes`.
    */
  /** Deterministic LSH cell per vector: the `nPlanes`-bit sign signature
    * under the md5-derived hyperplanes (the exact bucket key
    * [[lshBucketPairs]] groups by, surfaced as a column) — a clustering
    * every engine regenerates bit-exactly, which KMeans cells cannot
    * offer. Map-only; the planes broadcast with the task binary.
    */
  def lshCells(emb: DataFrame, nPlanes: Int): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val planes = planesFor(emb, nPlanes)
    val pb = spark.sparkContext.broadcast(planes)
    toVecs(emb).map { v =>
      val ps = pb.value
      val sig = signatureOf(ps, v.v)
      (v.id, sig)
    }.toDF("vec_id", "cell")
  }

  /** LSH-cell-restricted ANN top-k: for each query, rank only the corpus
    * vectors sharing its [[lshCells]] signature — the recall/cost dial an
    * index-free 100 TB ANN turns (brute force scores every vector; this
    * scores one cell). One shuffle keyed by the cell signature (the same
    * key [[lshBucketPairs]] uses), cosine scored stream-side against the
    * materialized per-cell query set.
    */
  def lshCellTopK(emb: DataFrame, queryPred: org.apache.spark.sql.Column,
      k: Int, nPlanes: Int): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val planes = planesFor(emb, nPlanes)
    val pb = spark.sparkContext.broadcast(planes)
    val corpus = toVecs(emb).map(v => (signatureOf(pb.value, v.v), v))
    val queries = toVecs(emb.filter(queryPred))
      .map(v => (signatureOf(pb.value, v.v), v))
    val scored = corpus.groupByKey(_._1)
      .cogroup(queries.groupByKey(_._1)) { (_, cs, qs) =>
        // queries per cell are few (the predicate bounds them) and
        // materialize; the cell's corpus side streams
        val qarr = qs.map(_._2).toArray
        if (qarr.isEmpty) Iterator.empty
        else cs.flatMap { case (_, c) =>
          qarr.iterator.filter(_.id != c.id).map { q =>
            (q.id, c.id, cosine(dot(q.v, c.v), q.norm, c.norm))
          }
        }
      }.toDF("q_id", "neighbor_id", "cos")
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    scored.withColumn("rk", row_number().over(w)).filter(col("rk") <= k)
      .select(col("q_id"), col("rk"), col("neighbor_id"))
  }

  /** Recall@k of [[lshCellTopK]] against the exact [[bruteForceTopK]]
    * ground truth — the evaluation loop every ANN deployment runs before
    * trading recall for cost. Output per query: (q_id, hits, recall_bp)
    * with recall_bp = hits·10000 div k (exact integers end to end).
    * Queries whose cell captured NO true neighbor still appear (hits 0).
    */
  def lshRecall(emb: DataFrame, queryPred: org.apache.spark.sql.Column,
      k: Int, nPlanes: Int): DataFrame = {
    val truth = bruteForceTopK(emb, queryPred, k)
      .select(col("q_id"), col("neighbor_id"))
    val approx = lshCellTopK(emb, queryPred, k, nPlanes)
      .select(col("q_id"), col("neighbor_id"))
    val hits = truth.join(approx, Seq("q_id", "neighbor_id"), "left_semi")
      .groupBy(col("q_id")).agg(count(lit(1)).as("__hits"))
    truth.select(col("q_id")).distinct()
      .join(hits, Seq("q_id"), "left")
      .select(col("q_id"),
        coalesce(col("__hits"), lit(0L)).as("hits"),
        expr(s"coalesce(__hits, 0L) * 10000L div ${k}L").as("recall_bp"))
  }

  /** Hyperplanes sized to the CORPUS's dimension (hardcoding 64 indexed
    * past the plane rows on wider embeddings and silently truncated
    * narrower ones), capped at 60 planes so the signature fits a Long
    * without sign games.
    */
  private def planesFor(emb: DataFrame, nPlanes: Int): Array[Array[Double]] = {
    require(nPlanes >= 1 && nPlanes <= 60,
      s"nPlanes must be in [1, 60] (Long signature), got $nPlanes")
    val first = emb.select(org.apache.spark.sql.functions.size(col("embedding")))
      .limit(1).collect()
    require(first.nonEmpty, "lsh planes: empty embedding corpus")
    val dim = first(0).getInt(0)
    require(dim >= 1, s"lsh planes: embedding dimension must be >= 1, got $dim")
    Array.tabulate(nPlanes, dim)((p, d) => planeCoord(p, d))
  }

  /** The sign-bit signature under `ps` — ONE definition, so the surfaced
    * [[lshCells]] key and [[lshBucketPairs]]'s grouping key can never
    * diverge (an Int accumulator here once aliased plane p with p-32).
    */
  private def signatureOf(ps: Array[Array[Double]], v: Array[Double]): Long = {
    var sig = 0L
    var p = 0
    while (p < ps.length) {
      var s = 0.0; var i = 0
      while (i < v.length) { s += ps(p)(i) * v(i); i += 1 }
      if (s >= 0) sig |= (1L << p)
      p += 1
    }
    sig
  }

  def lshBucketPairs(emb: DataFrame, nPlanes: Int, threshold: Double): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val corpus = toVecs(emb)
    // deterministic pseudo-random hyperplanes from md5 — the same scheme
    // every other sketch uses, so a SQL oracle can regenerate them
    // bit-exactly: 60-bit md5 prefix >> 8 is a 52-bit integer (exact in
    // double), scaled to [-1, 1)
    val planes = planesFor(emb, nPlanes)
    val pb = spark.sparkContext.broadcast(planes)
    val bucketed = corpus.map { v =>
      (signatureOf(pb.value, v.v), v)
    }
    bucketed.groupByKey(_._1).flatMapGroups { (_, it) =>
      val vs = it.map(_._2).toArray
      for {
        i <- (0 until vs.length).iterator
        j <- (i + 1) until vs.length
        a = vs(i); b = vs(j)
        c = cosine(dot(a.v, b.v), a.norm, b.norm)
        if c >= threshold
      } yield (math.min(a.id, b.id), math.max(a.id, b.id), c)
    }.toDF("a_id", "b_id", "cos")
  }
}
