package graft.examples

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.GraftSession

/** One-off equivalence prover for an optimization that restructures a
  * query: runs `before` and `after` on the same data dir and compares
  * row counts + an order-insensitive xxhash64 fingerprint of every row.
  * Exits nonzero (throws) on any mismatch — "prove equivalence before
  * moving on" (optimization-round contract).
  */
object EquivCheck {

  def fingerprint(df: DataFrame): (Long, java.math.BigDecimal) = {
    val cols = df.columns.sorted.map(c => col(c).cast("string"))
    val r = df.select(xxhash64(cols: _*).cast("decimal(38,0)").as("h"))
      .agg(count(lit(1)), coalesce(sum(col("h")),
        lit(0).cast("decimal(38,0)"))).first()
    (r.getLong(0), r.getDecimal(1))
  }

  def compare(name: String, before: DataFrame, after: DataFrame): Unit = {
    val b = fingerprint(before)
    val a = fingerprint(after)
    println(s"[equiv] $name before=(n=${b._1}, h=${b._2}) after=(n=${a._1}, h=${a._2})")
    require(a == b, s"$name: NOT EQUIVALENT")
    println(s"[equiv] $name OK")
  }

  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.local()
    // q_semantic_dedup: min-label vs alt-star connected components
    val pairs = graft.functions.Similarity
      .lshBucketPairs(graft.sources.Tables.embeddings(spark, d),
        nPlanes = 4, threshold = 0.3)
      .select(col("a_id"), col("b_id")).persist()
    compare("semantic_dedup.cc",
      graft.functions.Clusters.connectedComponents(pairs),
      graft.functions.Clusters.connectedComponentsAltStar(pairs))
    pairs.unpersist()
    spark.stop()
  }
}
