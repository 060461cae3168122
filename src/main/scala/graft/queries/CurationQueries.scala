package graft.queries

import org.apache.spark.sql.functions._

import graft.functions.Curation
import graft.sources.Tables

/** Corpus-curation operators over `documents` (LLM-pipeline extension):
  * benchmark decontamination, Gopher-style repetition filters,
  * deterministic stratified sampling and domain-mix rebalancing. All
  * sampling decisions are 60-bit md5 hashes — no RNG — so the DuckDB
  * oracle replays every kept row bit-exactly.
  */
object CurationQueries extends QuerySet {

  // doc_id % 50 == 0 stands in for the held-out benchmark set the corpus
  // must be decontaminated against
  private val EvalMod = 50

  val queries: Map[String, QFn] = Map(
    // benchmark decontamination: training docs sharing >= 1 four-token
    // shingle with the eval set, with the count of contaminated shingles
    // (downstream: anti-join these ids out of the corpus)
    "q_decontaminate" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      Curation.decontaminate(
        docs.filter(col("doc_id") % EvalMod =!= 0),
        docs.filter(col("doc_id") % EvalMod === 0),
        "text", n = 4)
    }),

    // Gopher-style repetition statistics + filter fractions per doc
    "q_repetition" -> ((s, d) =>
      Curation.repetitionStats(Tables.documents(s, d), "text")),

    // stratified sampling: per-language keep rates in basis points,
    // decided by a deterministic per-doc hash bucket
    "q_stratified_sample" -> ((s, d) => {
      val rate = when(col("lang") === "en", 8000L)
        .when(col("lang") === "de", 5000L)
        .when(col("lang") === "fr", 2500L)
        .otherwise(1000L)
      Curation.hashSample(Tables.documents(s, d), col("doc_id"), "sample", rate)
        .select(col("doc_id"), col("lang"),
          Curation.sampleBucket(col("doc_id"), "sample").as("bucket"))
    }),

    // corpus profiling: exact per-language length quantiles by
    // NEAREST-RANK selection (rank = ceil(q*n), all-integer, so the
    // DuckDB replay is hash-exact — no interpolation doubles). The
    // distributed shape is one per-group sort + one tiny count join; at
    // 100 TB swap in approx_percentile (t-digest, one pass, no sort)
    // when exactness isn't required
    "q_length_quantiles" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val docs = Tables.documents(s, d)
      val ranked = docs.withColumn("rn",
        row_number().over(
          Window.partitionBy(col("lang")).orderBy(col("n_chars"), col("doc_id"))))
      val counts = docs.groupBy(col("lang")).agg(count(lit(1)).as("n"))
      def atRank(pct: Int) =
        max(when(col("rn") === expr(s"(n * $pct + 99) div 100"), col("n_chars")))
      ranked.join(broadcast(counts), "lang")
        .groupBy(col("lang"))
        .agg(atRank(50).as("p50"), atRank(90).as("p90"), atRank(99).as("p99"))
    }),

    // domain-mix rebalancing: downsample domains above the uniform
    // char-share target to it (rates from one tiny broadcast aggregate)
    "q_domain_mix" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val rates = Curation.domainMixRates(docs, "source", "n_chars")
      docs.join(broadcast(rates), "source")
        .filter(Curation.sampleBucket(col("doc_id"), "mix") < col("rate_bp"))
        .select(col("doc_id"), col("source"), col("rate_bp"))
    })
  )

  // ---- DuckDB replays ----

  /** n-token shingles, 1-based positions: i ranges over [1, len-(n-1)). */
  private def shingleSql(n: Int, distinct: Boolean) = {
    val gram = (0 until n).map(o => s"t.toks[t.i + $o]").mkString(" || ' ' || ")
    val sel = if (distinct) "SELECT DISTINCT" else "SELECT"
    s"""$sel doc_id, $gram AS g
       |FROM (
       |  SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS toks,
       |         unnest(range(1, len(regexp_split_to_array(trim(text), '\\s+')) - ${n - 2})) AS i
       |  FROM documents) t""".stripMargin
  }

  private def bucket(salt: String, id: String) =
    s"('0x' || substr(md5('$salt:' || $id), 1, 15))::UBIGINT % 10000"

  val oracles: Map[String, String] = Map(
    "q_decontaminate" ->
      s"""WITH sh AS (${shingleSql(4, distinct = true)}),
         |ev AS (SELECT DISTINCT g FROM sh WHERE doc_id % $EvalMod = 0)
         |SELECT s.doc_id, CAST(count(*) AS BIGINT) AS n_hits
         |FROM sh s JOIN ev USING (g)
         |WHERE s.doc_id % $EvalMod <> 0
         |GROUP BY 1""".stripMargin,

    "q_repetition" ->
      s"""WITH tok AS (
         |  SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\\s+')) AS t
         |  FROM documents
         |), tc AS (
         |  SELECT doc_id, t, count(*) AS c FROM tok GROUP BY 1, 2
         |), t1 AS (
         |  SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens,
         |         CAST(count(*) AS BIGINT) AS n_distinct,
         |         CAST(max(c) AS BIGINT) AS top_token
         |  FROM tc GROUP BY 1
         |), bg AS (${shingleSql(2, distinct = false)}),
         |bc AS (
         |  SELECT doc_id, g, count(*) AS c FROM bg GROUP BY 1, 2
         |), t2 AS (
         |  SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_bigrams,
         |         CAST(max(c) AS BIGINT) AS top_bigram
         |  FROM bc GROUP BY 1
         |)
         |SELECT t1.doc_id, n_tokens, n_distinct, top_token,
         |       CAST(coalesce(n_bigrams, 0) AS BIGINT) AS n_bigrams,
         |       CAST(coalesce(top_bigram, 0) AS BIGINT) AS top_bigram,
         |       round(1 - n_distinct / CAST(n_tokens AS DOUBLE), 4) AS dup_token_frac,
         |       CASE WHEN n_bigrams IS NULL THEN 0.0
         |            ELSE round(top_bigram / CAST(n_bigrams AS DOUBLE), 4)
         |       END AS top_bigram_frac
         |FROM t1 LEFT JOIN t2 ON t1.doc_id = t2.doc_id""".stripMargin,

    "q_stratified_sample" ->
      s"""SELECT doc_id, lang,
         |  CAST(${bucket("sample", "doc_id")} AS BIGINT) AS bucket
         |FROM documents
         |WHERE ${bucket("sample", "doc_id")} <
         |  CASE lang WHEN 'en' THEN 8000 WHEN 'de' THEN 5000
         |            WHEN 'fr' THEN 2500 ELSE 1000 END""".stripMargin,

    "q_length_quantiles" ->
      """WITH c AS (
        |  SELECT lang, count(*) AS n FROM documents GROUP BY 1
        |), r AS (
        |  SELECT lang, n_chars,
        |         row_number() OVER (PARTITION BY lang
        |           ORDER BY n_chars, doc_id) AS rn
        |  FROM documents
        |)
        |SELECT r.lang,
        |  max(CASE WHEN rn = (n * 50 + 99) // 100 THEN n_chars END) AS p50,
        |  max(CASE WHEN rn = (n * 90 + 99) // 100 THEN n_chars END) AS p90,
        |  max(CASE WHEN rn = (n * 99 + 99) // 100 THEN n_chars END) AS p99
        |FROM r JOIN c USING (lang)
        |GROUP BY 1""".stripMargin,

    "q_domain_mix" ->
      s"""WITH per AS (
         |  SELECT source, sum(n_chars) AS domain_w FROM documents GROUP BY 1
         |), tot AS (
         |  SELECT sum(domain_w) AS total_w, count(*) AS n_domains FROM per
         |), rates AS (
         |  SELECT source,
         |         least(10000, ((total_w // n_domains) * 10000) // domain_w)
         |           AS rate_bp
         |  FROM per, tot
         |)
         |SELECT d.doc_id, d.source, CAST(r.rate_bp AS BIGINT) AS rate_bp
         |FROM documents d JOIN rates r USING (source)
         |WHERE ${bucket("mix", "d.doc_id")} < r.rate_bp""".stripMargin
  )
}
