package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data Selection via Importance Resampling (DSIR, Xie et al. 2023):
  * pick raw-corpus documents whose hashed-n-gram feature profile looks
  * like a small high-quality TARGET corpus, by importance weights
  * w(doc) = p_target(features) / p_raw(features) under a bag-of-hashed-
  * n-grams multinomial, sampled without replacement via the Gumbel
  * top-k trick. LLM-pipeline extension beyond the reference's operator
  * set (same family as [[Curation.temperatureSample]]).
  *
  * Scale shape (the part that matters at 100 TB):
  *  - feature extraction is IN-ROW — unigram+bigram buckets come from
  *    `transform`/`zip_with` over the token array, no explode of the
  *    corpus, no shuffle;
  *  - the two feature-distribution estimates are one partial-aggregable
  *    `groupBy(bucket)` each, collapsing to `b` rows (b = 1024 default)
  *    regardless of corpus size;
  *  - the per-bucket log-ratio table λ is a `b`-long array literal that
  *    rides the task binary (the Bloom/PQ broadcast-artifact pattern), so
  *    scoring is a map-only scan: `aggregate(buckets, 0L, acc + λ[b])`;
  *  - selection is `orderBy(key).limit(k)` which Spark lowers to
  *    TakeOrdered — per-partition top-k then a k-row driver merge, never
  *    a global sort.
  *
  * Cross-engine determinism: λ entries and the Gumbel perturbation are
  * quantized to integer micro-nats BEFORE summation (the [[NGramLm]]
  * contract), per-doc weights are exact integer sums of λ entries, the
  * Gumbel uniform is the 60-bit md5 hash ([[MinHashLsh.hash60]]) mapped
  * to (0,1) by `(h + 0.5) / 2^60`, and ties break on doc id — so the
  * selected set is bit-identical across engines, partitionings, retries.
  */
object Dsir {

  val DefaultBuckets = 1024

  /** In-row hashed feature buckets of a document: word unigrams plus
    * word bigrams (space-joined, matching the shingle convention), each
    * hashed into `[0, b)` via the salted 60-bit md5 hash. Native
    * [[DsirBuckets60Expr]] — one byte scan per document inside
    * whole-stage codegen, no token array or gram strings; bit-equality
    * with [[featureBucketsReference]] is spec-pinned (DsirSpec).
    */
  def featureBuckets(textCol: Column, b: Int): Column =
    ShingleHash60.dsirBucketsColumn(textCol, "dsir:", b)

  /** The functions-only formula [[featureBuckets]] compiles down to —
    * retained as the cross-engine reference implementation (it is what
    * the DuckDB oracles replay in SQL).
    */
  def featureBucketsReference(textCol: Column, b: Int): Column = {
    val t = split(trim(textCol), "\\s+")
    def bucket(g: Column) =
      pmod(MinHashLsh.hash60(concat(lit("dsir:"), g)), lit(b.toLong))
    val uni = transform(t, x => bucket(x))
    val n = size(t)
    val big = zip_with(
      slice(t, lit(1), greatest(n - 1, lit(0))),
      slice(t, lit(2), greatest(n - 1, lit(0))),
      (a, x) => bucket(concat(a, lit(" "), x)))
    when(n >= 2, concat(uni, big)).otherwise(uni)
  }

  /** Per-bucket importance log-ratio λ[b] in integer micro-nats:
    * `round((ln(c_t[b]+1) − ln(n_t+b) − ln(c_r[b]+1) + ln(n_r+b))·1e6)`
    * — add-one-smoothed multinomial estimates for the target and raw
    * feature distributions. Two `groupBy(bucket)` aggregates (partial-
    * aggregable, b-row results) and one b-row driver computation; the
    * logs run through Spark's `ln` so the DuckDB oracle's `ln` replays
    * them at the shared micro-nat quantization.
    */
  def lambdaMicros(target: DataFrame, raw: DataFrame, textCol: String,
      b: Int = DefaultBuckets): Array[Long] =
    lambdaMicrosSplit(
      target.withColumn("__t", lit(true))
        .unionByName(raw.withColumn("__t", lit(false))),
      textCol, col("__t"), b)

  /** [[lambdaMicros]] over one frame with a target predicate — BOTH
    * feature distributions come from a SINGLE corpus scan (conditional
    * partial aggregation per bucket), which is the difference between 2
    * and 1 passes over 100 TB.
    */
  def lambdaMicrosSplit(docs: DataFrame, textCol: String, isTarget: Column,
      b: Int = DefaultBuckets): Array[Long] = {
    val both = docs
      .select(isTarget.as("__t"),
        explode(featureBuckets(col(textCol), b)).as("b"))
      .groupBy(col("b"))
      .agg(sum(when(col("__t"), 1L).otherwise(0L)).as("ct"),
        sum(when(!col("__t"), 1L).otherwise(0L)).as("cr"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    val ct = both.view.mapValues(_._1).toMap
    val cr = both.view.mapValues(_._2).toMap
    val nt = ct.valuesIterator.sum
    val nr = cr.valuesIterator.sum
    val spark = docs.sparkSession
    // b-row local frame routed through Spark's ln/round so quantization
    // happens in the SAME engine arithmetic the scoring column uses
    import spark.implicits._
    (0L until b.toLong).map(i =>
        (i, ct.getOrElse(i, 0L), cr.getOrElse(i, 0L)))
      .toDF("b", "ct", "cr")
      .select(col("b"),
        round((log(col("ct") + 1) - log(lit((nt + b).toDouble))
          - (log(col("cr") + 1) - log(lit((nr + b).toDouble)))) * 1e6)
          .cast("long").as("lam"))
      .collect().sortBy(_.getLong(0)).map(_.getLong(1))
  }

  /** Per-document importance log-weight in micro-nats: the exact integer
    * sum of λ over the document's feature buckets. Map-only.
    */
  def logwMicros(textCol: Column, lam: Array[Long], b: Int): Column =
    aggregate(featureBuckets(textCol, b), lit(0L),
      (acc, x) => acc + element_at(typedLit(lam.toSeq), (x + 1).cast("int")))

  /** Deterministic Gumbel perturbation in micro-nats: g = −ln(−ln(u))
    * with u = (hash60(salt:id) + 0.5) / 2^60 ∈ (0, 1). Adding it to the
    * log-weight and taking the top k IS sampling k docs without
    * replacement with probability proportional to their weights (the
    * Gumbel top-k identity) — but from a hash, so re-runs, retries and
    * the oracle replay draw the SAME sample.
    */
  def gumbelMicros(id: Column, salt: String): Column =
    round(-log(-log(
      (MinHashLsh.hash60(concat(lit(salt + ":"), id.cast("string")))
        .cast("double") + 0.5) / lit(Kmv.M))) * 1e6).cast("long")

  /** DSIR selection: importance-resample `ceil(frac · |candidates|)`
    * documents from `docs.filter(!isTarget)` toward the feature profile
    * of `docs.filter(isTarget)`. Output: (doc_id, lang, logw_micros,
    * key_micros), the selected rows.
    */
  def sample(docs: DataFrame, textCol: String, isTarget: Column,
      b: Int = DefaultBuckets, fracBp: Int = 2000): DataFrame = {
    val lam = lambdaMicrosSplit(docs, textCol, isTarget, b)
    val scored = docs.filter(!isTarget)
      .select(col("doc_id"), col("lang"),
        logwMicros(col(textCol), lam, b).as("logw_micros"))
      .withColumn("key_micros",
        col("logw_micros") + gumbelMicros(col("doc_id"), "gum"))
    val n = docs.filter(!isTarget).count()
    // ceil(n·frac), clamped: limit() takes an Int, and an unclamped
    // .toInt wraps NEGATIVE past ~10.7B candidates at fracBp = 2000
    // (limit then throws, or silently truncates for other wrap values).
    // A >2B-row SELECTION should go through hashSample rates, not a
    // global top-k — the clamp keeps this entry point honest about it.
    val k = math.min((n * fracBp + 9999) / 10000, Int.MaxValue.toLong).toInt
    scored.orderBy(col("key_micros").desc, col("doc_id").asc).limit(k)
  }
}
