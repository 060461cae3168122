package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.functions.{Bm25, BudgetSelect, NGramLm, Rrf, Similarity}
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
  // fusion: depth of each input list / of the fused output
  private val FuseK = 50
  private val FusedK = 20
  // diversified re-rank: candidate depth, per-source cap, final k
  private val DiverseCand = 100
  private val DiversePerSrc = 2
  private val DiverseK = 20

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
        "n_tokens", BudgetPct)),

    // hybrid retrieval: BM25 keyword top-50 ⊕ cosine top-50 for query
    // vector 0 (vec_id aligns with doc_id in the corpus), fused by
    // integer reciprocal-rank — see [[graft.functions.Rrf]]. Both legs
    // are the ALREADY-VERIFIED producers (q_bm25_topk / q_ann_topk
    // machinery); the window re-rank runs over 50 rows, not the corpus
    "q_rrf_fusion" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val kw = Bm25.topK(Tables.documents(s, d), "doc_id", "text", Terms, FuseK)
        .select(col("doc_id"), row_number()
          .over(Window.orderBy(col("score").desc, col("doc_id")))
          .cast("long").as("rk"))
      val vs = Similarity
        .bruteForceTopK(Tables.embeddings(s, d), col("vec_id") === 0, FuseK)
        .select(col("neighbor_id").as("doc_id"), col("rk"))
      Rrf.fuse(Seq("kw" -> kw, "vec" -> vs), "doc_id", FusedK)
    }),

    // inverted-index postings for the query vocabulary: (term, doc_id,
    // tf, first_pos) — in-row positional explode, literal in-set filter
    // in the scan stage, partial-aggregable count/min (plan-gated)
    "q_inverted_index" -> ((s, d) =>
      graft.functions.Postings.forTerms(Tables.documents(s, d), "doc_id",
        "text", Terms)),

    // diversified retrieval re-rank: BM25 top-100 candidates, at most 2
    // results per source domain, global top-20 — the standard
    // search-results diversification. Candidate generation is the
    // TakeOrdered top-k; every window below it runs over <= 100 rows,
    // never the corpus (the 100-row side broadcasts into the source join)
    "q_bm25_diverse" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val docs = Tables.documents(s, d)
      val cand = Bm25.topK(docs, "doc_id", "text", Terms, DiverseCand)
        .join(docs.select(col("doc_id"), col("source")), "doc_id")
      cand.withColumn("sr", row_number().over(
          Window.partitionBy(col("source"))
            .orderBy(col("score").desc, col("doc_id"))))
        .filter(col("sr") <= DiversePerSrc)
        .withColumn("rk", row_number().over(
          Window.orderBy(col("score").desc, col("doc_id"))).cast("long"))
        .filter(col("rk") <= DiverseK)
        .select(col("doc_id"), col("source"), col("score"), col("rk"))
    }),

    // classic TF-IDF weights for the query vocabulary: idf quantized to
    // integer micro-nats from ONE ln, then tf·idf is pure int64 — the
    // postings scan + a vocab-sized df table + a 1-row doc count, all
    // broadcast back over the postings
    "q_tfidf" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val post = graft.functions.Postings
        .forTerms(docs, "doc_id", "text", Terms)
        .select(col("term"), col("doc_id"), col("tf"))
      val dfT = post.groupBy(col("term")).agg(count(lit(1)).as("df"))
      val n = docs.agg(count(lit(1)).as("n"))
      post.join(broadcast(dfT), "term").crossJoin(broadcast(n))
        .select(col("term"), col("doc_id"), col("tf"),
          round(log(col("n").cast("double") / col("df").cast("double"))
            * lit(1000000.0)).cast("long").as("idf_micro"))
        .withColumn("tfidf_micro", col("tf") * col("idf_micro"))
    }),

    // term co-occurrence + PMI over the query vocabulary (the GloVe-/
    // collocation-style signal): per-doc presence flags are MAP-SIDE
    // bits, ONE partial-aggregable pass sums them — no explode, no join;
    // pmi quantized to micro-nats from one ln per pair
    "q_term_pmi" -> ((s, d) => {
      val toksArr = split(trim(lower(col("text"))), "\\s+")
      val flagged = Tables.documents(s, d).select(
        Terms.map(t =>
          when(array_contains(toksArr, t), 1L).otherwise(0L).as(s"__$t"))
          :+ lit(1L).as("__one"): _*)
      val sums = flagged.agg(
        sum(col("__one")).as("n"),
        Terms.map(t => sum(col(s"__$t")).as(s"c_$t")) ++
          Terms.combinations(2).map { case Seq(a, b) =>
            sum(col(s"__$a") * col(s"__$b")).as(s"c_${a}_$b")
          }.toSeq: _*)
      val pairs = Terms.combinations(2).toSeq.map { case Seq(a, b) =>
        sums.select(lit(a).as("t1"), lit(b).as("t2"),
          col(s"c_${a}_$b").as("n_both"),
          when(col(s"c_${a}_$b") === 0, lit(null).cast("long"))
            .otherwise(round(log(
              col("n").cast("double") * col(s"c_${a}_$b").cast("double") /
                (col(s"c_$a").cast("double") * col(s"c_$b").cast("double")))
              * lit(1000000.0)).cast("long")).as("pmi_micro"))
      }
      pairs.reduce(_ unionByName _)
    }),

    // the PERSISTED retrieval index (functions/PostingsStore): term-
    // bucketed postings built from half the corpus, the rest folded in
    // idempotently WITH overlap (re-offered docs must be dropped — a
    // double-indexed doc doubles its tf and breaks the hash), then BM25
    // served from the query terms' buckets only. Bit-identical to the
    // two-scan Bm25.topK for matched docs, so the oracle is the shared
    // replay restricted to raw > 0 (an index never returns 0-score
    // fillers)
    "q_bm25_store_topk" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val tmp = java.nio.file.Files.createTempDirectory("graft-postings-").toString
      try {
        new graft.functions.PostingsStore(s, tmp + "/ix", buckets = 16)
          .write(docs.filter(col("doc_id") % 2 === 0))
        val ix = graft.functions.PostingsStore.open(s, tmp + "/ix")
        ix.appendIdempotent(docs.filter(col("doc_id") % 3 =!= 1)) // overlaps evens
        ix.appendIdempotent(docs) // full replay: everything already claimed
        ix.topK(Terms, K).localCheckpoint(true)
      } finally StagedLogs.deleteRecursively(tmp)
    }),

    // STREAMED maintenance of the retrieval index: seed with a corpus
    // prefix, replicate the WHOLE document feed through a checkpointed
    // stream (micro-batches fold in via appendIdempotent — the seed
    // overlap is re-offered and must be dropped, or its tf doubles and
    // the hash breaks), then serve BM25 from the converged index
    "q_bm25_store_stream" -> ((s, d) => {
      val docs = Tables.documents(s, d).select(col("doc_id"), col("text"))
      val tmp = java.nio.file.Files.createTempDirectory("graft-postrepl-").toString
      try {
        docs.write.parquet(tmp + "/feed")
        val ix = new graft.functions.PostingsStore(s, tmp + "/ix", buckets = 16)
        ix.write(docs.filter(col("doc_id") < 50))
        val q = ix.replicate(
            s.readStream.schema(docs.schema)
              .option("maxFilesPerTrigger", 8).parquet(tmp + "/feed"),
            tmp + "/cp")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination()
        ix.topK(Terms, K).localCheckpoint(true)
      } finally StagedLogs.deleteRecursively(tmp)
    }),

    // held-out trigram scoring with stupid backoff: model trained on the
    // even half, odd half scored — unseen trigrams actually exercise the
    // backoff chain (the level counts prove it); α = 0.5 keeps every
    // branch one exact IEEE division
    "q_lm_heldout" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      NGramLm.backoffScore(
        docs.filter(col("doc_id") % 2 === 0),
        docs.filter(col("doc_id") % 2 === 1),
        "doc_id", "text")
    })
  )

  private val tokCount = TextMetrics.tokCountSql
  private val pad = TextMetrics.padSql
  private def occSql(expr: String, marker: String) =
    TextMetrics.occSql(expr, marker)

  val oracles: Map[String, String] = Map(
    "q_bm25_topk" -> Bm25.oracleSql("doc_id", Terms, K),
    // the index converges to the full corpus (overlaps deduplicated) and
    // serves matched docs only
    "q_bm25_store_topk" ->
      Bm25.oracleSql("doc_id", Terms, K, matchedOnly = true),
    // the replicated index converges to exactly the same corpus
    "q_bm25_store_stream" ->
      Bm25.oracleSql("doc_id", Terms, K, matchedOnly = true),
    "q_lm_score" -> NGramLm.scoreOracleSql("doc_id"),
    "q_lm_buckets" -> NGramLm.bucketsOracleSql("doc_id"),
    "q_token_budget" ->
      (s"""WITH d AS (
          |  SELECT doc_id,
          |         round(${occSql(pad, " the ")} / CAST($tokCount AS DOUBLE), 4) AS score,
          |         CAST($tokCount AS BIGINT) AS w
          |  FROM documents
          |)""".stripMargin +
        BudgetSelect.oracleSqlTail("doc_id", BudgetPct, "n_tokens")),

    // both legs are the EXACT oracle bodies of q_bm25_topk and q_ann_topk
    // (nested-CTE subqueries), so a fusion mismatch can only come from
    // the fusion arithmetic itself
    "q_rrf_fusion" ->
      s"""WITH kw AS (${Bm25.oracleSql("doc_id", Terms, FuseK)}),
         |kwr AS (
         |  SELECT doc_id, CAST(row_number() OVER (ORDER BY score DESC, doc_id)
         |    AS BIGINT) AS rk
         |  FROM kw
         |), vs AS (${SimilarityQueries.bruteTopkSqlFor("b.vec_id = 0", FuseK)}),
         |u AS (
         |  SELECT COALESCE(kwr.doc_id, vs.neighbor_id) AS doc_id,
         |         COALESCE(kwr.rk, CAST(0 AS BIGINT)) AS kw_rk,
         |         COALESCE(CAST(vs.rk AS BIGINT), CAST(0 AS BIGINT)) AS vec_rk
         |  FROM kwr FULL OUTER JOIN vs ON vs.neighbor_id = kwr.doc_id
         |)
         |SELECT doc_id, kw_rk, vec_rk, rrf_q FROM (
         |  SELECT doc_id, kw_rk, vec_rk,
         |         ${Rrf.scoreSql("kw_rk")} + ${Rrf.scoreSql("vec_rk")} AS rrf_q
         |  FROM u ORDER BY rrf_q DESC, doc_id LIMIT $FusedK)""".stripMargin,

    "q_inverted_index" ->
      graft.functions.Postings.oracleSql("doc_id", Terms),

    // postings oracle body reused as the tf leg; idf from ONE ln,
    // micro-quantized; tf*idf pure int64 (outputs all CAST — the
    // HUGEINT lesson)
    "q_tfidf" ->
      s"""WITH p AS (${graft.functions.Postings.oracleSql("doc_id", Terms)}),
         |dfT AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM p GROUP BY 1),
         |n AS (SELECT count(*) AS n FROM documents)
         |SELECT p.term, p.doc_id, p.tf,
         |       CAST(round(ln(CAST(n.n AS DOUBLE) / CAST(dfT.df AS DOUBLE))
         |         * 1000000.0) AS BIGINT) AS idf_micro,
         |       p.tf * CAST(round(ln(CAST(n.n AS DOUBLE) / CAST(dfT.df AS DOUBLE))
         |         * 1000000.0) AS BIGINT) AS tfidf_micro
         |FROM p JOIN dfT USING (term) CROSS JOIN n""".stripMargin,

    "q_term_pmi" -> {
      val toks = "regexp_split_to_array(trim(lower(text)), '\\s+')"
      val flags = Terms.map(t =>
        s"CASE WHEN list_contains($toks, '$t') THEN 1 ELSE 0 END AS f_$t")
        .mkString(", ")
      val sums = (Seq("count(*) AS n") ++
        Terms.map(t => s"sum(f_$t) AS c_$t") ++
        Terms.combinations(2).map { case Seq(a, b) =>
          s"sum(f_$a * f_$b) AS c_${a}_$b"
        }).mkString(", ")
      val rows = Terms.combinations(2).toSeq.map { case Seq(a, b) =>
        s"""SELECT '$a' AS t1, '$b' AS t2, CAST(c_${a}_$b AS BIGINT) AS n_both,
           |  CASE WHEN c_${a}_$b = 0 THEN NULL
           |       ELSE CAST(round(ln(CAST(n AS DOUBLE) * CAST(c_${a}_$b AS DOUBLE)
           |            / (CAST(c_$a AS DOUBLE) * CAST(c_$b AS DOUBLE)))
           |            * 1000000.0) AS BIGINT) END AS pmi_micro
           |FROM s""".stripMargin
      }.mkString("\nUNION ALL\n")
      s"WITH f AS (SELECT $flags FROM documents), s AS (SELECT $sums FROM f)\n$rows"
    },

    "q_lm_heldout" ->
      NGramLm.backoffOracleSql("doc_id", "doc_id % 2 = 0", "doc_id % 2 = 1"),

    // candidate leg is the exact q_bm25_topk oracle body at depth 100
    "q_bm25_diverse" ->
      s"""WITH kw AS (${Bm25.oracleSql("doc_id", Terms, DiverseCand)}),
         |j AS (
         |  SELECT kw.doc_id, d.source, kw.score
         |  FROM kw JOIN documents d USING (doc_id)
         |), dv AS (
         |  SELECT doc_id, source, score,
         |         row_number() OVER (PARTITION BY source
         |           ORDER BY score DESC, doc_id) AS sr
         |  FROM j
         |)
         |SELECT doc_id, source, score, rk FROM (
         |  SELECT doc_id, source, score,
         |         CAST(row_number() OVER (ORDER BY score DESC, doc_id)
         |           AS BIGINT) AS rk
         |  FROM dv WHERE sr <= $DiversePerSrc)
         |WHERE rk <= $DiverseK""".stripMargin
  )
}
