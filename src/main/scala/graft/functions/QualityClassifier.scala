package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Model-based quality filtering — the fastText-style classifier stage of
  * LLM data pipelines (GPT-3/LLaMA-style: label a small set, train a
  * linear model over hashed n-gram features, keep documents the model
  * scores as reference-like). The model is multinomial Naive Bayes over
  * the SAME hashed unigram+bigram feature space as [[Dsir]] — NB's
  * per-feature class log-odds are exactly DSIR's λ table, so training
  * reuses [[Dsir.lambdaMicrosSplit]] (one conditional partial-agg corpus
  * scan, b-row result) and adds the class-prior log-odds term; a document
  * scores `prior + Σ λ[feature]` in exact integer micro-nats and is kept
  * when the posterior favors the positive class (score > 0).
  *
  * Scale shape: training collapses to b+1 driver-side longs however big
  * the labeled set is; scoring is a map-only scan with the model riding
  * the task binary as an array literal ([[Dsir.logwMicros]]); the decision
  * is a codegen'd comparison. No shuffle anywhere after training.
  *
  * Cross-engine determinism: identical to the DSIR contract — λ and prior
  * quantized to integer micro-nats before summation, so per-doc scores
  * are exact integer sums, bit-identical at any partitioning.
  */
object QualityClassifier {

  /** Trained model: per-bucket feature log-odds + class-prior log-odds,
    * both in integer micro-nats.
    */
  final case class Model(lambdaMicros: Array[Long], priorMicros: Long,
      buckets: Int)

  /** Train on `docs` (the labeled set): `isPos` marks reference-quality
    * rows. Feature log-odds from one conditional aggregation; the prior
    * is `round((ln(nPos+1) − ln(nNeg+1))·1e6)` over DOC counts, routed
    * through the same engine arithmetic as λ so the oracle replays it.
    */
  def train(docs: DataFrame, textCol: String, isPos: Column,
      b: Int = Dsir.DefaultBuckets): Model = {
    val lam = Dsir.lambdaMicrosSplit(docs, textCol, isPos, b)
    val cnt = docs.agg(
      sum(when(isPos, 1L).otherwise(0L)).as("np"),
      sum(when(!isPos, 1L).otherwise(0L)).as("nn")).collect()(0)
    val np = if (cnt.isNullAt(0)) 0L else cnt.getLong(0)
    val nn = if (cnt.isNullAt(1)) 0L else cnt.getLong(1)
    val spark = docs.sparkSession
    import spark.implicits._
    val prior = Seq((np, nn)).toDF("np", "nn")
      .select(round((log(col("np") + 1) - log(col("nn") + 1)) * 1e6)
        .cast("long"))
      .collect()(0).getLong(0)
    Model(lam, prior, b)
  }

  /** Per-document score in micro-nats: positive = reference-like. */
  def scoreMicros(textCol: Column, m: Model): Column =
    lit(m.priorMicros) + Dsir.logwMicros(textCol, m.lambdaMicros, m.buckets)

  /** Score + decision columns appended to `scored` — map-only. */
  def withScores(scored: DataFrame, textCol: String, m: Model,
      scoreCol: String = "score_micros",
      predCol: String = "pred_pos"): DataFrame =
    scored.withColumn(scoreCol, scoreMicros(col(textCol), m))
      .withColumn(predCol, col(scoreCol) > 0L)
}
