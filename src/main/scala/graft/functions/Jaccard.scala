package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** n-gram Jaccard near-duplicate pairs over a document table (LLM-pipeline
  * dedup extension).
  *
  * Plan: distinct hashed n-token shingles per doc → inverted-index bucket
  * join (one shuffle on the shingle hash; a self-join would rescan the
  * shingle pipeline per side) → per-pair intersection counts → integer
  * Jaccard filter. n >= 3 keeps shingles rare so buckets stay small
  * (single-token buckets explode on stopwords at scale); `maxBucket`
  * ([[BucketedPairs.prune]]) guards the degenerate case of N identical
  * documents anyway.
  *
  * The threshold is a rational `num/den` compared in integer arithmetic
  * (`inter * den >= union * num`) — exact, no float drift between engines.
  */
object Jaccard {

  def pairs(docs: DataFrame, textCol: String, n: Int,
      thresholdNum: Int, thresholdDen: Int,
      maxBucket: Int = Int.MaxValue): DataFrame =
    pairsWithDrops(docs, textCol, n, thresholdNum, thresholdDen, maxBucket).pairs

  /** Near-dup pairs plus the dropped-bucket side output (sh, members) —
    * capped by default for pipeline use.
    */
  def pairsWithDrops(docs: DataFrame, textCol: String, n: Int,
      thresholdNum: Int, thresholdDen: Int,
      maxBucket: Int = BucketedPairs.DefaultMaxBucket): MinHashLsh.CandidatePairs = {
    import docs.sparkSession.implicits._
    // shingles are hashed to 8-byte keys before the distinct (collision
    // p ~ 1e-8 at this cardinality is the only divergence risk); the
    // native Shingle60Expr skips materializing the shingle strings
    val sh = MinHashLsh.hashedShingles(docs, textCol, n)
      .select(col("doc_id"), col("h").as("sh"))
    val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("sz"))
    val sp = BucketedPairs.split(sh, Seq("sh"), maxBucket)
    val inter = sp.kept
      .groupBy(col("sh")).agg(collect_list(col("doc_id")).as("ids"))
      .select(col("ids")).as[Seq[Long]]
      .flatMap { ids =>
        val sorted = ids.sorted
        for {
          i <- sorted.indices.iterator
          j <- (i + 1) until sorted.size
        } yield (sorted(i), sorted(j))
      }
      .toDF("doc_id", "b_id")
      .groupBy(col("doc_id"), col("b_id"))
      .agg(count(lit(1)).as("inter"))
    val out = inter
      .join(sizes, "doc_id")
      .join(sizes.select(col("doc_id").as("b_id"), col("sz").as("b_sz")), "b_id")
      .filter(col("inter") * thresholdDen >=
        (col("sz") + col("b_sz") - col("inter")) * thresholdNum)
      .select(col("doc_id").as("a_id"), col("b_id"), col("inter"),
        (col("sz") + col("b_sz") - col("inter")).as("uni"))
    MinHashLsh.CandidatePairs(out, sp.dropped)
  }
}
