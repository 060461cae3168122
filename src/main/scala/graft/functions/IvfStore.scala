package graft.functions

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** IVF-partitioned vector store: the PHYSICAL-layout half of [[Ivf]] —
  * embeddings persisted hive-partitioned by their coarse cell, norms
  * precomputed at write time. An ANN query then prunes at the STORAGE
  * layer: its nProbe cells become a partition predicate
  * (PartitionFilters, gated in IvfStoreSpec), so the scan lists and reads
  * only nProbe/nCentroids of the corpus files — the DiskANN/IVF-on-
  * object-storage serving shape. At 100 TB with 1024 cells and
  * nProbe=8, a query batch touches <1% of the bytes, with zero index
  * structures beyond the directory layout itself.
  *
  * Same exactness anchor as [[Ivf]]: at full probe the cell predicate
  * admits everything and results equal [[Similarity.bruteForceTopK]]
  * (spec-enforced + oracle q_ivf_store_topk) — partial probe is a pure
  * subset relaxation.
  */
object IvfStore {
  // static kernels: executor closures must not capture the (non-
  // serializable) store instance
  private def sqDist(a: Array[Double], b: Array[Double]): Double = {
    var i = 0; var s = 0.0
    while (i < b.length) { val d = a(i) - b(i); s += d * d; i += 1 }
    s
  }

  private def dot(a: Array[Double], b: Array[Double]): Double = {
    var i = 0; var s = 0.0
    while (i < a.length) { s += a(i) * b(i); i += 1 }
    s
  }
}

final class IvfStore(spark: SparkSession, val path: String,
    centroids: Array[Array[Double]]) {

  import IvfStore.{dot, sqDist}
  import Similarity.Vec
  import spark.implicits._

  /** Partition the corpus by nearest-centroid cell (one broadcast +
    * map-only scan, the [[Ivf.assign]] pass) and persist with
    * precomputed norms — query time pays neither assignment nor norm.
    */
  def write(emb: DataFrame): Unit = {
    val cb = spark.sparkContext.broadcast(centroids)
    // cell/norm computed on exact double widenings, but the STORED
    // embedding keeps the source's element type — persisting the cast
    // would double the index's footprint and every probed scan's bytes
    // for a FLOAT[] corpus, for identical search results (the score
    // path widens on read)
    val cellUdf = udf { (v: Seq[Double]) =>
      val a = v.toArray
      val cs = cb.value
      var best = 0; var bestD = Double.MaxValue
      var c = 0
      while (c < cs.length) {
        val d = sqDist(cs(c), a)
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      best
    }
    val normUdf = udf { (v: Seq[Double]) =>
      var n = 0.0
      v.foreach(x => n += x * x)
      math.sqrt(n)
    }
    val d = col("embedding").cast("array<double>")
    emb.select(col("vec_id"), col("embedding"),
        normUdf(d).as("norm"), cellUdf(d).as("cell"))
      .repartition(col("cell"))
      .sortWithinPartitions(col("cell"), col("vec_id"))
      .write.partitionBy("cell").mode("overwrite").parquet(path)
  }

  /** The cell-pruned read an nProbe query batch performs. */
  def probedCorpus(probeCells: Set[Int]): DataFrame =
    spark.read.parquet(path)
      .filter(col("cell").isin(probeCells.toSeq: _*))

  /** Cosine top-k per query vector, probing each query's nProbe nearest
    * cells. `queries` is a (vec_id, embedding) batch — collected to the
    * driver (query batches are small; the corpus never is).
    */
  def searchTopK(queries: DataFrame, k: Int, nProbe: Int): DataFrame = {
    val qVecs = Similarity.vecRows(queries).collect()
      .map { case (id, v) =>
        var i = 0; var n = 0.0
        while (i < v.length) { val x = v(i); n += x * x; i += 1 }
        Vec(id, v, math.sqrt(n))
      }
    val probes: Map[Long, Set[Int]] = qVecs.map { q =>
      q.id -> centroids.indices
        .sortBy(c => sqDist(centroids(c), q.v))
        .take(math.min(nProbe, centroids.length)).toSet
    }.toMap
    val allCells = probes.values.flatten.toSet
    val qb = spark.sparkContext.broadcast(qVecs)
    val pb = spark.sparkContext.broadcast(probes)
    val scored = probedCorpus(allCells)
      .select(col("vec_id"), col("embedding").cast("array<double>"),
        col("norm"), col("cell").cast("int"))
      .as[(Long, Array[Double], Double, Int)]
      .mapPartitions { it =>
        val qs = qb.value
        val pr = pb.value
        it.flatMap { case (id, v, norm, cell) =>
          qs.iterator
            .filter(q => q.id != id && pr(q.id).contains(cell))
            .map(q => (q.id, id, Similarity.cosine(dot(q.v, v), q.norm, norm)))
        }
      }.toDF("q_id", "neighbor_id", "cos")
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    scored.withColumn("rk", row_number().over(w)).filter(col("rk") <= k)
      .select(col("q_id"), col("rk"), col("neighbor_id"), col("cos"))
  }
}
