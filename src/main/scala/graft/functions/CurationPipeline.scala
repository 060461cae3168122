package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The end-to-end corpus curation pipeline a training-data run executes —
  * the flagship composition of this engine's curation layer:
  *
  *  1. quality gate: minimum length + repetition bound (pure per-doc
  *     column math — runs in the scan);
  *  2. exact dedup: keep the smallest doc id per content fingerprint;
  *  3. decontamination: drop docs sharing an n-gram with the eval set;
  *  4. near-dup dedup: MinHash/LSH candidates → exact-Jaccard verify →
  *     connected components → keep each cluster's representative;
  *  5. deterministic stratified sample by language.
  *
  * Stage ORDER is the scale design: each stage is strictly more
  * expensive per surviving row than the last (map-only → one shuffle →
  * broadcast join → pairwise sketch machinery), so the corpus shrinks
  * before the expensive joins see it. All decisions are deterministic
  * (integer thresholds, md5 sampling buckets) — a re-run or a DuckDB
  * replay keeps every row bit-identically.
  *
  * The repetition gate compares `n_distinct * 100 >= n_tokens * minDistinctPct`
  * in integers — no float fraction crosses an engine boundary.
  */
object CurationPipeline {

  /** `kept`: the final corpus (doc_id, lang, source). `droppedBuckets`:
    * over-cap LSH buckets the near-dup stage refused to explode
    * (band, bval, members) — route their members to a dedicated
    * exact-dedup pass. `release()` unpins the survivor sets cached for
    * the multi-stage reuse.
    */
  final case class Result(kept: DataFrame, droppedBuckets: DataFrame,
      stages: Seq[(String, DataFrame)], release: () => Unit) {
    /** Per-stage surviving-document counts plus the quarantined-bucket
      * count — the drop ledger a pipeline operator watches. Runs one
      * count job per stage; the intermediate stages are persisted, so
      * this never re-runs the CC fixpoint.
      */
    def ledger(): Seq[(String, Long)] =
      stages.map { case (name, df) => name -> df.count() } :+
        ("quarantined_buckets" -> droppedBuckets.count())
  }

  /** @param maxBucket per-LSH-bucket cap for the near-dup stage. The
    *   capped default keeps one boilerplate cluster (N near-identical
    *   docs → one band bucket → N² in-task pairs) from straggling the
    *   whole run; its members come back in [[Result.droppedBuckets]] for
    *   quarantine routing rather than silently exploding the join.
    *   `Int.MaxValue` restores exhaustive pairing.
    */
  def curate(docs: DataFrame, eval: DataFrame, textCol: String = "text",
      minTokens: Int = 30, minDistinctPct: Int = 35,
      decontShingle: Int = 4,
      sampleRateBp: Column = when(col("lang") === "en", 8000L)
        .when(col("lang") === "de", 5000L)
        .when(col("lang") === "fr", 2500L)
        .otherwise(1000L),
      maxBucket: Int = BucketedPairs.DefaultMaxBucket): Result = {
    val t = split(trim(col(textCol)), "\\s+")
    // 1. quality gate: length + repetition, single scan, no shuffle
    val s1 = docs.filter(size(t) >= minTokens &&
      size(array_distinct(t)) * 100 >= size(t) * minDistinctPct)
    // 2. exact dedup: keep min doc_id per content hash
    val keepIds = s1.groupBy(md5(col(textCol)).as("fp"))
      .agg(min(col("doc_id")).as("doc_id")).select(col("doc_id"))
    val s2 = s1.join(keepIds, "doc_id").persist()
    // 3. decontamination: anti-join the contaminated ids
    val contaminated = Curation
      .decontaminate(s2, eval, textCol, decontShingle).select(col("doc_id"))
    val s3 = s2.join(contaminated, Seq("doc_id"), "left_anti").persist()
    // 4. near-dup dedup: pairs on the SURVIVING corpus only (capped — an
    // over-cap bucket is a boilerplate cluster, not a pair candidate
    // set), then keep each component's min-id representative
    val nd = DedupPipeline.nearDuplicates(s3, textCol, maxBucket = maxBucket)
    val nonReps = Clusters
      .connectedComponents(nd.pairs.select(col("a_id"), col("b_id")))
      .filter(col("doc_id") =!= col("component")).select(col("doc_id"))
    // persisted so a later ledger()/kept re-read hits the cache instead
    // of re-running the anti-join over the checkpointed CC labels
    val s4 = s3.join(nonReps, Seq("doc_id"), "left_anti").persist()
    // 5. deterministic stratified sample
    val s5 = Curation.hashSample(s4, col("doc_id"), "sample", sampleRateBp)
      .select(col("doc_id"), col("lang"), col("source"))
    Result(
      kept = s5,
      droppedBuckets = nd.droppedBuckets,
      stages = Seq("input" -> docs, "quality" -> s1, "exact_dedup" -> s2,
        "decontaminated" -> s3, "near_dedup" -> s4, "sampled" -> s5),
      release = () => { nd.unpersist(); s4.unpersist(); s3.unpersist()
        s2.unpersist(); () })
  }
}
