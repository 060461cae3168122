package graft.functions

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed bigram language model: train n-gram counts over the corpus
  * in one shuffle pass, then score every document by its mean per-bigram
  * log-likelihood under add-one smoothing — the CCNet-style "LM quality"
  * signal a training-data pipeline buckets documents with (head/middle/
  * tail). The reference has no NLP surface; this is the LLM-pipeline
  * extension layer, sitting next to quality scoring and dedup.
  *
  * Model: P(w2 | w1) = (c(w1,w2) + 1) / (hist(w1) + V), where c is the
  * corpus bigram count, hist(w1) = Σ_w c(w1,w) the history count and V
  * the corpus vocabulary size. Documents with fewer than 2 tokens have no
  * bigrams and are excluded from scoring.
  *
  * Plan shape (holds at 100 TB):
  *   - bigram generation is a per-row `transform(sequence(...))` — no
  *     shuffle, no UDF;
  *   - the count tables are partial-aggregable `groupBy` shuffles keyed
  *     on (w1,w2) / w1; the scoring joins are plain equi-joins on those
  *     keys (AQE broadcasts them when the vocabulary is small, as here;
  *     an open-vocabulary corpus falls back to shuffle hash joins, which
  *     is the correct shape when the model itself is data-sized);
  *   - V is a 1-row count-distinct, broadcast;
  *   - per-document reduction is one more partial-aggregable groupBy.
  *
  * Determinism contract with the DuckDB oracle: each bigram's log-prob is
  * quantized to integer micro-nats (`round(ln(p)·1e6)`) BEFORE the
  * per-document sum, so the sum is exact integer arithmetic — immune to
  * the partition-order nondeterminism of floating-point addition. The ln
  * argument is a single IEEE division of integer-derived doubles, bit-
  * identical across engines.
  */
object NGramLm {

  private def toks(textCol: String) =
    split(trim(lower(col(textCol))), "\\s+")

  /** (idCol, w1, w2) — one row per adjacent token pair. */
  def bigrams(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol), toks(textCol).as("__ts"))
      .where(size(col("__ts")) >= 2)
      .select(col(idCol), explode(expr(
        "transform(sequence(1, size(__ts) - 1), " +
          "i -> struct(element_at(__ts, i) AS w1, element_at(__ts, i + 1) AS w2))"))
        .as("__bg"))
      .select(col(idCol), col("__bg.w1").as("w1"), col("__bg.w2").as("w2"))

  /** Per-document LM score: (idCol, n_bigrams, avg_logp) with avg_logp =
    * round(Σ micro-nats / 1e6 / n_bigrams, 4).
    */
  def score(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tok = docs.select(col(idCol), toks(textCol).as("__ts"))
    val bg = bigrams(docs, idCol, textCol)
    // swap-pinned (CachePins): bc feeds both the scoring join and the
    // hist roll-up — without it Spark re-runs the whole bigram-count
    // corpus scan for hist (no subtree sharing). The table is
    // vocab²-bounded, not corpus-sized, so it always fits; the registry
    // bounds a per-batch caller to ONE live pin instead of one per call.
    val bc = graft.core.CachePins.swap("ngramlm.score.bc",
      bg.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("__c2")))
    val hist = bc.groupBy(col("w1")).agg(sum(col("__c2")).as("__ch"))
    val vocab = tok.select(explode(col("__ts")).as("__w"))
      .agg(countDistinct(col("__w")).as("__vs"))

    // left joins + coalesce so the same scorer also handles held-out text
    // (unseen bigram → c2=0, unseen history → P = 1/V); on the training
    // corpus itself every pair matches.
    val scored = bg
      .join(bc, Seq("w1", "w2"), "left")
      .join(hist, Seq("w1"), "left")
      .crossJoin(broadcast(vocab))
    val p = (coalesce(col("__c2"), lit(0L)) + lit(1L)).cast("double") /
      (coalesce(col("__ch"), lit(0L)) + col("__vs")).cast("double")
    val micros = round(log(p) * lit(1000000.0)).cast("long")

    scored.select(col(idCol), micros.as("__m"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bigrams"), sum(col("__m")).as("__sm"))
      .select(col(idCol), col("n_bigrams"),
        round(col("__sm").cast("double") / lit(1000000.0) /
          col("n_bigrams").cast("double"), 4).as("avg_logp"))
  }

  /** (idCol, w1, w2, w3) — one row per adjacent token triple. */
  def trigrams(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol), toks(textCol).as("__ts"))
      .where(size(col("__ts")) >= 3)
      .select(col(idCol), explode(expr(
        "transform(sequence(1, size(__ts) - 2), " +
          "i -> struct(element_at(__ts, i) AS w1, " +
          "element_at(__ts, i + 1) AS w2, " +
          "element_at(__ts, i + 2) AS w3))")).as("__tg"))
      .select(col(idCol), col("__tg.w1").as("w1"), col("__tg.w2").as("w2"),
        col("__tg.w3").as("w3"))

  /** Held-out trigram scoring with STUPID BACKOFF (Brants et al. 2007):
    * score `eval` docs under counts trained on `train` —
    *
    *   p = c3(w1w2w3)/c2(w1w2)            if the trigram was seen,
    *     = 0.5 · c2(w2w3)/c1(w2)          else if the bigram was seen,
    *     = 0.25 · (c1(w3)+1)/(N+V)        else (add-one unigram floor).
    *
    * α = 0.5 (not the folk 0.4): halving is an EXACT exponent shift, so
    * every branch is exactly ONE correctly rounded IEEE division — the
    * [[Pca]] power-of-two discipline — and the micro-nat quantization
    * before the per-doc sum keeps the aggregate pure int64. Output per
    * eval doc: (idCol, n_trigrams, n_tri, n_bo2, n_bo1, avg_logp) — the
    * backoff-level counts are the model-coverage diagnostic a corpus
    * shift shows up in first.
    *
    * Plan shape: count tables are vocab-bounded partial aggregates; the
    * eval trigram stream left-joins them (AQE broadcasts closed-domain
    * models; an open-vocabulary web model shuffles, correctly); the
    * (N, V) scalars broadcast as a 1-row cross join; the per-doc
    * reduction is one partial-aggregable groupBy.
    */
  def backoffScore(train: DataFrame, eval: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val c3 = trigrams(train, idCol, textCol)
      .groupBy(col("w1"), col("w2"), col("w3"))
      .agg(count(lit(1)).as("__c3"))
    val c2 = bigrams(train, idCol, textCol)
      .groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("__c2"))
    val uni = train.select(explode(toks(textCol)).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("__c1"))
    val nv = train.select(explode(toks(textCol)).as("w"))
      .agg(count(lit(1)).as("__n"), countDistinct(col("w")).as("__vs"))

    val scored = trigrams(eval, idCol, textCol)
      .join(c3, Seq("w1", "w2", "w3"), "left")
      .join(c2, Seq("w1", "w2"), "left")
      .join(c2.select(col("w1").as("w2"), col("w2").as("w3"),
        col("__c2").as("__c2b")), Seq("w2", "w3"), "left")
      .join(uni.select(col("w").as("w2"), col("__c1").as("__c1h")),
        Seq("w2"), "left")
      .join(uni.select(col("w").as("w3"), col("__c1").as("__c1w")),
        Seq("w3"), "left")
      .crossJoin(broadcast(nv))
    val p = when(col("__c3").isNotNull,
        col("__c3").cast("double") / col("__c2").cast("double"))
      .when(col("__c2b").isNotNull,
        lit(0.5) * col("__c2b").cast("double") / col("__c1h").cast("double"))
      .otherwise(lit(0.25) * (coalesce(col("__c1w"), lit(0L)) + lit(1L))
        .cast("double") / (col("__n") + col("__vs")).cast("double"))
    val level = when(col("__c3").isNotNull, 3)
      .when(col("__c2b").isNotNull, 2).otherwise(1)
    scored.select(col(idCol),
        round(log(p) * lit(1000000.0)).cast("long").as("__m"),
        level.as("__lvl"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_trigrams"),
        sum(when(col("__lvl") === 3, 1L).otherwise(0L)).as("n_tri"),
        sum(when(col("__lvl") === 2, 1L).otherwise(0L)).as("n_bo2"),
        sum(when(col("__lvl") === 1, 1L).otherwise(0L)).as("n_bo1"),
        sum(col("__m")).as("__sm"))
      .select(col(idCol), col("n_trigrams"), col("n_tri"), col("n_bo2"),
        col("n_bo1"),
        round(col("__sm").cast("double") / lit(1000000.0) /
          col("n_trigrams").cast("double"), 4).as("avg_logp"))
  }

  /** DuckDB replay of [[backoffScore]] with train = `$table` restricted
    * by `trainPred`, eval by `evalPred` — branch structure, α constants
    * and quantization identical op-for-op.
    */
  def backoffOracleSql(idCol: String, trainPred: String, evalPred: String,
      table: String = "documents", textCol: String = "text"): String =
    s"""WITH tokall AS MATERIALIZED (
       |  SELECT $idCol, regexp_split_to_array(trim(lower($textCol)), '\\s+') AS ts
       |  FROM $table
       |), tg AS MATERIALIZED (
       |  SELECT $idCol, ts[i] AS w1, ts[i + 1] AS w2, ts[i + 2] AS w3
       |  FROM tokall, unnest(generate_series(1, len(ts) - 2)) AS u(i)
       |  WHERE len(ts) >= 3
       |), c3 AS (
       |  SELECT w1, w2, w3, count(*) AS c3 FROM tg
       |  WHERE $trainPred GROUP BY 1, 2, 3
       |), bgt AS (
       |  SELECT $idCol, ts[i] AS w1, ts[i + 1] AS w2
       |  FROM tokall, unnest(generate_series(1, len(ts) - 1)) AS u(i)
       |  WHERE len(ts) >= 2
       |), c2 AS (
       |  SELECT w1, w2, count(*) AS c2 FROM bgt WHERE $trainPred GROUP BY 1, 2
       |), uni AS (
       |  SELECT w, count(*) AS c1
       |  FROM (SELECT $idCol, unnest(ts) AS w FROM tokall)
       |  WHERE $trainPred GROUP BY 1
       |), nv AS (
       |  SELECT count(*) AS n, count(DISTINCT w) AS vs
       |  FROM (SELECT $idCol, unnest(ts) AS w FROM tokall)
       |  WHERE $trainPred
       |), sc AS (
       |  SELECT e.$idCol,
       |    CASE WHEN c3.c3 IS NOT NULL THEN 3
       |         WHEN cb.c2 IS NOT NULL THEN 2 ELSE 1 END AS lvl,
       |    CAST(round(ln(
       |      CASE WHEN c3.c3 IS NOT NULL
       |             THEN CAST(c3.c3 AS DOUBLE) / CAST(c2.c2 AS DOUBLE)
       |           WHEN cb.c2 IS NOT NULL
       |             THEN 0.5 * CAST(cb.c2 AS DOUBLE) / CAST(uh.c1 AS DOUBLE)
       |           ELSE 0.25 * CAST(coalesce(uw.c1, 0) + 1 AS DOUBLE)
       |                / CAST(nv.n + nv.vs AS DOUBLE) END) * 1000000.0)
       |      AS BIGINT) AS m
       |  FROM tg e
       |  LEFT JOIN c3 ON c3.w1 = e.w1 AND c3.w2 = e.w2 AND c3.w3 = e.w3
       |  LEFT JOIN c2 ON c2.w1 = e.w1 AND c2.w2 = e.w2
       |  LEFT JOIN c2 cb ON cb.w1 = e.w2 AND cb.w2 = e.w3
       |  LEFT JOIN uni uh ON uh.w = e.w2
       |  LEFT JOIN uni uw ON uw.w = e.w3
       |  CROSS JOIN nv
       |  WHERE $evalPred
       |)
       |SELECT $idCol, CAST(count(*) AS BIGINT) AS n_trigrams,
       |       CAST(sum(CASE WHEN lvl = 3 THEN 1 ELSE 0 END) AS BIGINT) AS n_tri,
       |       CAST(sum(CASE WHEN lvl = 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_bo2,
       |       CAST(sum(CASE WHEN lvl = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_bo1,
       |       round(CAST(sum(m) AS DOUBLE) / 1000000.0
       |             / CAST(count(*) AS DOUBLE), 4) AS avg_logp
       |FROM sc GROUP BY 1""".stripMargin

  /** CCNet-style tertile bucketing of [[score]]: head = most-likely third
    * of documents, tail = least. Boundaries come from the exact histogram
    * quantile (smallest value whose cumulative count reaches ⌈p·N/100⌉ —
    * the same engine-replayable selection as
    * [[Curation.exactQuantiles]]); the histogram is over the ROUNDED
    * 4-decimal scores, so its size is bounded by the score domain, not
    * the corpus. Output: (idCol, avg_logp, bucket).
    */
  def buckets(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    // swap-pinned (CachePins): the score table feeds both the
    // quantile-boundary branch and the bucketing scan; recomputing it
    // would run the whole LM pipeline twice. Per-doc rows (id, n,
    // score) — disk-spillable.
    val s = graft.core.CachePins.swap("ngramlm.buckets.s",
      score(docs, idCol, textCol),
      org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val q = Curation.exactQuantiles(
      s.withColumn("__g", lit(1)), "__g", "avg_logp", Seq(33, 66))
    s.crossJoin(broadcast(q.select(col("p33"), col("p66"))))
      .select(col(idCol), col("avg_logp"),
        when(col("avg_logp") <= col("p33"), "tail")
          .when(col("avg_logp") <= col("p66"), "middle")
          .otherwise("head").as("bucket"))
  }

  /** Shared DuckDB replay of the model + per-document score (the WITH
    * chain ending in `s(doc_id, n_bigrams, avg_logp)`).
    */
  def oracleCtes(idCol: String, table: String = "documents",
      textCol: String = "text"): String =
    s"""WITH tok AS MATERIALIZED (
       |  SELECT $idCol, regexp_split_to_array(trim(lower($textCol)), '\\s+') AS ts
       |  FROM $table
       |), bg AS MATERIALIZED (
       |  SELECT $idCol, ts[i] AS w1, ts[i + 1] AS w2
       |  FROM tok, unnest(generate_series(1, len(ts) - 1)) AS u(i)
       |  WHERE len(ts) >= 2
       |), bc AS MATERIALIZED (
       |  SELECT w1, w2, count(*) AS c2 FROM bg GROUP BY 1, 2
       |), hist AS (
       |  SELECT w1, sum(c2) AS ch FROM bc GROUP BY 1
       |), v AS (
       |  SELECT count(DISTINCT w) AS vs
       |  FROM (SELECT unnest(ts) AS w FROM tok)
       |), sc AS (
       |  SELECT $idCol,
       |         CAST(round(ln(CAST(coalesce(c2, 0) + 1 AS DOUBLE)
       |                    / CAST(coalesce(ch, 0) + vs AS DOUBLE))
       |                    * 1000000.0) AS BIGINT) AS m
       |  FROM bg LEFT JOIN bc USING (w1, w2)
       |          LEFT JOIN hist USING (w1) CROSS JOIN v
       |), s AS MATERIALIZED (
       |  SELECT $idCol, count(*) AS n_bigrams,
       |         round(CAST(sum(m) AS DOUBLE) / 1000000.0
       |               / CAST(count(*) AS DOUBLE), 4) AS avg_logp
       |  FROM sc GROUP BY 1
       |)""".stripMargin

  /** DuckDB replay of [[score]]. */
  def scoreOracleSql(idCol: String): String =
    oracleCtes(idCol) + s"\nSELECT $idCol, n_bigrams, avg_logp FROM s"

  /** DuckDB replay of [[buckets]] — histogram-quantile boundary selection
    * identical to the Spark side's ⌈p·N/100⌉ rule.
    */
  def bucketsOracleSql(idCol: String): String =
    oracleCtes(idCol) +
      s""", h AS (
         |  SELECT avg_logp AS val, count(*) AS c FROM s GROUP BY 1
         |), cum AS (
         |  SELECT val, sum(c) OVER (ORDER BY val) AS cm,
         |         sum(c) OVER () AS n
         |  FROM h
         |), b AS (
         |  SELECT min(CASE WHEN cm >= (n * 33 + 99) // 100 THEN val END) AS p33,
         |         min(CASE WHEN cm >= (n * 66 + 99) // 100 THEN val END) AS p66
         |  FROM cum
         |)
         |SELECT $idCol, avg_logp,
         |       CASE WHEN avg_logp <= p33 THEN 'tail'
         |            WHEN avg_logp <= p66 THEN 'middle'
         |            ELSE 'head' END AS bucket
         |FROM s CROSS JOIN b""".stripMargin
}
