package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The canonical at-scale near-duplicate pipeline: LSH candidate
  * generation followed by exact-Jaccard verification computed on the
  * CANDIDATE pairs only — at 100 TB the verification join touches
  * |candidates| × shingles, never all-pairs. ONE hashed-shingle pass
  * (persisted) feeds both the signatures and the verification, so the
  * corpus is exploded and deduplicated exactly once.
  *
  * This is the capped PIPELINE entry point: `maxBucket` defaults to
  * [[BucketedPairs.DefaultMaxBucket]], so a boilerplate cluster (N
  * identical documents → one band bucket → N² in-task pairs) cannot
  * straggle the stage; the dropped buckets come back as a side output for
  * quarantine routing (each names a band value whose members should go to
  * an exact-dedup pass). Verification callers wanting exhaustive pairs
  * pass `maxBucket = Int.MaxValue`.
  */
object DedupPipeline {

  /** `pairs`: verified near-dup pairs (a_id, b_id, inter, uni).
    * `droppedBuckets`: over-cap LSH buckets (band, bval, members).
    * `quarantinedDocs`: distinct doc_id of every document in an over-cap
    * bucket — the first-class form of the quarantine ROUTE the scaladoc
    * promises (feed these to an exact-dedup pass, e.g. groupBy a content
    * hash); lazily composed, so an all-kept run prices nothing.
    * Call [[Result.unpersist]] when done — the pipeline pins its shared
    * hashed-shingle pass in storage memory; long-lived sessions should
    * release it once the outputs are consumed.
    */
  final case class Result(pairs: DataFrame, droppedBuckets: DataFrame,
      quarantinedDocs: DataFrame, private val shared: DataFrame) {
    def unpersist(): Unit = { shared.unpersist(); () }
  }

  /** @param thresholdNum/thresholdDen Jaccard threshold as a rational,
    *   compared in integer arithmetic (no cross-engine float drift)
    */
  def nearDuplicates(docs: DataFrame, textCol: String = "text", n: Int = 3,
      k: Int = 8, bandRows: Int = 2,
      thresholdNum: Int = 5, thresholdDen: Int = 10,
      maxBucket: Int = BucketedPairs.DefaultMaxBucket): Result = {
    // validate BEFORE anything is pinned: a bad banding config must not
    // strand a persisted plan the caller has no handle to release
    require(bandRows >= 1 && k % bandRows == 0,
      s"bandRows $bandRows must divide k $k")
    require(thresholdDen >= 1 && thresholdNum >= 0,
      s"threshold $thresholdNum/$thresholdDen must be a non-negative rational")
    // pinned through CachePins: repeated runs in one session swap (the
    // previous run's pin is released) and the harness's releaseAll
    // reclaims a pin whose Result a caller discarded — a raw persist
    // here leaked one CacheManager entry per dropped Result
    val sh60 = graft.core.CachePins.swap("graft.dedup-pipeline.shingles",
      MinHashLsh.hashedShingles(docs, textCol, n))
    val sig = MinHashLsh.signatureFromHashed(sh60, k)
    val cw = MinHashLsh.lshCandidatesWithDrops(sig, k, bandRows, maxBucket)
    val sizes = sh60.groupBy(col("doc_id")).agg(count(lit(1)).as("sz"))
    val inter = cw.pairs
      .join(sh60.select(col("doc_id").as("a_id"), col("h")), "a_id")
      .join(sh60.select(col("doc_id").as("b_id"), col("h")), Seq("b_id", "h"))
      .groupBy(col("a_id"), col("b_id"))
      .agg(count(lit(1)).as("inter"))
    // At thresholdNum = 0 ("every verified candidate with stats") a
    // candidate pair with ZERO shared shingles (an affine-collision
    // band match) must still surface, so the candidate list LEFT-joins
    // the intersection counts. Any positive threshold filters inter = 0
    // rows anyway — there the grouped-intersection inner chain is
    // equivalent AND skips re-joining the full candidate list (the
    // unconditional left join measured 1.6x on the pipeline row)
    val withInter =
      if (thresholdNum == 0)
        cw.pairs.join(inter, Seq("a_id", "b_id"), "left_outer")
          .withColumn("inter", coalesce(col("inter"), lit(0L)))
      else inter
    val pairs = withInter
      .join(sizes.select(col("doc_id").as("a_id"), col("sz").as("a_sz")), "a_id")
      .join(sizes.select(col("doc_id").as("b_id"), col("sz").as("b_sz")), "b_id")
      .filter(col("inter") * thresholdDen >=
        (col("a_sz") + col("b_sz") - col("inter")) * thresholdNum)
      .select(col("a_id"), col("b_id"), col("inter"),
        (col("a_sz") + col("b_sz") - col("inter")).as("uni"))
    // quarantine members: the dropped (band, bval) keys name their docs
    // via a semi-join back onto the banding — rides the SAME persisted
    // shingle pass (sig derives from sh60), one extra shuffle only when
    // the route is actually taken
    val quarantined = MinHashLsh.banded(sig, k, bandRows)
      .join(cw.droppedBuckets.select(col("band"), col("bval")),
        Seq("band", "bval"), "left_semi")
      .select(col("doc_id")).distinct()
    Result(pairs, cw.droppedBuckets, quarantined, sh60)
  }
}
