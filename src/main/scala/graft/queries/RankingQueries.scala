package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.functions.{Bm25, BudgetSelect, NGramLm}
import graft.sources.Tables

/** Ranking + selection queries over `documents`: BM25 keyword search, the
  * bigram-LM CCNet-style quality signal, and token-budgeted corpus
  * selection. See [[graft.functions.Bm25]] / [[graft.functions.NGramLm]] /
  * [[graft.functions.BudgetSelect]] for plan-shape and cross-engine
  * determinism notes.
  */
object RankingQueries extends QuerySet {

  // 'dup' is the corpus's one rare token (df≈5% of docs) — high idf, so
  // the top-k actually exercises idf contrast rather than length norm only
  private val Terms = Seq("dup", "vector", "scan")
  private val K = 20
  private val BudgetPct = 40

  // same quality signal as q_quality_score (stopword ratio) — literally
  // the SAME definition ([[TextMetrics]]), not a formula kept in sync
  private def qualityRanked(s: org.apache.spark.sql.SparkSession,
      d: String): org.apache.spark.sql.DataFrame = {
    val t = col("text")
    val nTok = graft.functions.TokenCount.column(t).cast("long")
    Tables.documents(s, d).select(col("doc_id"),
      round(TextMetrics.occurrences(TextMetrics.padded(t), " the ")
        .cast("double") / nTok, 4).as("score"),
      nTok.as("n_tokens"))
  }

  val queries: Map[String, QFn] = Map(
    // BM25 top-k keyword ranking: one stats scan + one scoring scan,
    // TakeOrdered top-k (no global sort)
    "q_bm25_topk" -> ((s, d) =>
      Bm25.topK(Tables.documents(s, d), "doc_id", "text", Terms, K)),

    // bigram-LM mean log-likelihood per document (micro-nat-quantized —
    // the per-doc sum is exact integer arithmetic)
    "q_lm_score" -> ((s, d) =>
      NGramLm.score(Tables.documents(s, d), "doc_id", "text")),

    // CCNet-style head/middle/tail tertiles of the LM score via the
    // exact histogram quantile
    "q_lm_buckets" -> ((s, d) =>
      NGramLm.buckets(Tables.documents(s, d), "doc_id", "text")),

    // token-budgeted greedy selection: the best 40% of corpus tokens by
    // stopword-ratio quality — histogram boundary search, doc-level
    // window over the boundary score only
    "q_token_budget" -> ((s, d) =>
      BudgetSelect.select(qualityRanked(s, d), "doc_id", "score",
        "n_tokens", BudgetPct))
  )

  private val tokCount = TextMetrics.tokCountSql
  private val pad = TextMetrics.padSql
  private def occSql(expr: String, marker: String) =
    TextMetrics.occSql(expr, marker)

  val oracles: Map[String, String] = Map(
    "q_bm25_topk" -> Bm25.oracleSql("doc_id", Terms, K),
    "q_lm_score" -> NGramLm.scoreOracleSql("doc_id"),
    "q_lm_buckets" -> NGramLm.bucketsOracleSql("doc_id"),
    "q_token_budget" ->
      (s"""WITH d AS (
          |  SELECT doc_id,
          |         round(${occSql(pad, " the ")} / CAST($tokCount AS DOUBLE), 4) AS score,
          |         CAST($tokCount AS BIGINT) AS w
          |  FROM documents
          |)""".stripMargin +
        BudgetSelect.oracleSqlTail("doc_id", BudgetPct, "n_tokens"))
  )
}
