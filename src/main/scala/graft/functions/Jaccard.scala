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
    val (inter, dropped) = intersections(docs, textCol, n, maxBucket)
    val out = inter
      .filter(col("inter") * thresholdDen >=
        (col("a_sz") + col("b_sz") - col("inter")) * thresholdNum)
      .select(col("a_id"), col("b_id"), col("inter"),
        (col("a_sz") + col("b_sz") - col("inter")).as("uni"))
    MinHashLsh.CandidatePairs(out, dropped)
  }

  /** CONTAINMENT near-superset pairs: C(A→B) = |A∩B| / |A| over the same
    * shingle sets — the asymmetric signal that catches excerpts, quotes
    * and boilerplate-wrapped copies whose JACCARD is low because the
    * containing document is much larger (a 50-shingle quote inside a
    * 5000-shingle page has J ≈ 0.01 but C ≈ 1.0). Keeps pairs where the
    * SMALLER side's containment clears num/den — exact integer compare,
    * `inter·den ≥ min(sz)·num` — and names that side `contained_id`
    * (ties → the lower doc_id, matching the a_id < b_id pair order).
    * Same inverted-index bucket-join plan as [[pairs]]: one shuffle on
    * the shingle hash, per-bucket caps, no all-pairs.
    */
  def containmentPairs(docs: DataFrame, textCol: String, n: Int,
      thresholdNum: Int, thresholdDen: Int,
      maxBucket: Int = BucketedPairs.DefaultMaxBucket): DataFrame =
    containmentPairsWithDrops(docs, textCol, n, thresholdNum, thresholdDen,
      maxBucket).pairs

  /** Containment pairs plus the dropped-bucket quarantine side (sh,
    * members) — the same discipline as [[pairsWithDrops]] and the LSH /
    * SimHash / perceptual paths: an over-cap shingle bucket is a side
    * OUTPUT routed to exact dedup, never a silent prune.
    */
  def containmentPairsWithDrops(docs: DataFrame, textCol: String, n: Int,
      thresholdNum: Int, thresholdDen: Int,
      maxBucket: Int = BucketedPairs.DefaultMaxBucket): MinHashLsh.CandidatePairs = {
    val (inter, dropped) = intersections(docs, textCol, n, maxBucket)
    val out = inter
      .filter(col("inter") * thresholdDen >=
        least(col("a_sz"), col("b_sz")) * thresholdNum)
      .select(col("a_id"), col("b_id"), col("inter"),
        col("a_sz"), col("b_sz"),
        when(col("a_sz") <= col("b_sz"), col("a_id")).otherwise(col("b_id"))
          .as("contained_id"))
    MinHashLsh.CandidatePairs(out, dropped)
  }

  /** Shared candidate machinery: distinct hashed shingles → capped
    * inverted-index buckets → per-pair intersection counts with both
    * sizes attached. Output (a_id, b_id, inter, a_sz, b_sz),
    * a_id < b_id.
    */
  private def intersections(docs: DataFrame, textCol: String, n: Int,
      maxBucket: Int): (DataFrame, DataFrame) = {
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
      .toDF("a_id", "b_id")
      .groupBy(col("a_id"), col("b_id"))
      .agg(count(lit(1)).as("inter"))
      .join(sizes.select(col("doc_id").as("a_id"), col("sz").as("a_sz")), "a_id")
      .join(sizes.select(col("doc_id").as("b_id"), col("sz").as("b_sz")), "b_id")
    (inter, sp.dropped)
  }
}
