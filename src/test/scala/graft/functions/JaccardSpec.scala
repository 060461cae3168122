package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Containment vs Jaccard semantics on a hand corpus: the asymmetric
  * signal must catch an excerpt inside a much larger document that the
  * symmetric Jaccard gate misses, name the contained side, and respect
  * the exact integer threshold.
  */
class JaccardSpec extends SparkSpec {
  import SparkSpec.spark.implicits._

  // doc 1 = 30 distinct-ish tokens; doc 2 = its first 6 tokens (an
  // excerpt); doc 3 = unrelated
  private val big = (1 to 30).map(i => s"w$i").mkString(" ")
  private val excerpt = (1 to 6).map(i => s"w$i").mkString(" ")
  private val other = (100 to 120).map(i => s"x$i").mkString(" ")
  private def corpus = Seq(
    (1L, big), (2L, excerpt), (3L, other)).toDF("doc_id", "text")

  test("containment catches the excerpt the Jaccard gate misses") {
    // shingles: big has 28, excerpt has 4, all 4 inside big →
    // C = 4/4 = 1.0, J = 4/(28+4-4) = 1/7 ≈ 0.14
    val jacc = Jaccard.pairs(corpus, "text", 3, 5, 10).collect()
    assert(!jacc.exists(r => r.getLong(0) == 1L && r.getLong(1) == 2L),
      "J ≈ 0.14 must not pass the 0.5 Jaccard gate")
    val cont = Jaccard.containmentPairs(corpus, "text", 3, 6, 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(cont.toSeq == Seq((1L, 2L, 4L, 28L, 4L, 2L)),
      s"expected the excerpt pair with contained_id=2, got ${cont.toSeq}")
  }

  test("threshold is an exact integer compare on the smaller side") {
    // inter = 4 of excerpt's 4: C(smaller) = 1.0 ≥ anything ≤ 1;
    // demand 11/10 (> 1.0) and the pair must vanish
    assert(Jaccard.containmentPairs(corpus, "text", 3, 11, 10)
      .collect().isEmpty)
  }

  test("ties on size name the lower doc_id as contained") {
    val twins = Seq((5L, big), (4L, big)).toDF("doc_id", "text")
    val out = Jaccard.containmentPairs(twins, "text", 3, 9, 10)
      .select(col("a_id"), col("b_id"), col("contained_id"))
      .as[(Long, Long, Long)].collect()
    assert(out.toSeq == Seq((4L, 5L, 4L)))
  }

  test("containment quarantine: over-cap shingle buckets are a side " +
      "output with exact membership, never a silent prune") {
    // 5 docs share the hot prefix (one shingle bucket of 5 members);
    // each also has a private tail so sizes differ
    val hot = "h1 h2 h3"
    val docs = (1 to 5).map(i =>
      (i.toLong, s"$hot t${i}a t${i}b t${i}c")).toDF("doc_id", "text")
    val capped = Jaccard.containmentPairsWithDrops(docs, "text", 3, 6, 10,
      maxBucket = 4)
    val drops = capped.droppedBuckets.collect()
    assert(drops.length == 1 && drops(0).getAs[Long]("members") == 5L,
      s"the 5-member hot bucket must land in quarantine, got ${drops.toSeq}")
    // the quarantined bucket's hash is the engine's shingle hash of the
    // hot prefix — routable back to its member documents
    val hotHash = docs.sparkSession.range(1)
      .select(explode(ShingleHash60.column(lit(hot), 3)).as("h"))
      .collect()(0).getLong(0)
    assert(drops(0).getAs[Long]("sh") == hotHash)
    // pairs must come only from the under-cap buckets (none here: every
    // other shingle is private to its doc)
    assert(capped.pairs.collect().isEmpty)
    // uncapped: the bucket pairs all 5 docs and quarantine is empty
    val open = Jaccard.containmentPairsWithDrops(docs, "text", 3, 1, 10,
      maxBucket = Int.MaxValue)
    assert(open.droppedBuckets.collect().isEmpty)
    assert(open.pairs.count() == 10L) // C(5,2) via the shared bucket
  }
}
