package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** BM25 keyword ranking over a document corpus — the text-side counterpart
  * of the embedding ANN queries (reference has no search surface; this is
  * part of the LLM-pipeline extension layer, alongside dedup/curation).
  *
  * Two corpus scans, both fully distributed:
  *   1. a single 1-row aggregate collects every corpus statistic BM25
  *      needs — N, total token count (for avgdl) and one document
  *      frequency per query term (`array_contains` conditional sums, all
  *      in the same partial-aggregable pass);
  *   2. the scoring scan cross-joins that broadcast 1-row stats frame and
  *      computes the Robertson/Sparck-Jones BM25 score per document as a
  *      pure column expression (tf via `filter(tokens)`, no UDFs), then
  *      takes the global top-k (Spark lowers orderBy+limit to a
  *      per-partition TakeOrdered — no full sort, no single-partition
  *      shuffle).
  *
  * At 100 TB: stage 1 is map-side-combined into 1 row; stage 2 is
  * embarrassingly parallel with a k-row result. Nothing materializes an
  * inverted index — for a FIXED small query-term set the two-scan form is
  * strictly cheaper; a serving system answering many ad-hoc queries would
  * build the index once instead (that trade is documented, not hidden).
  *
  * Determinism contract with the DuckDB oracle: every floating-point step
  * is either an IEEE-exact operation on integer-derived doubles
  * (divisions, multiplies in a fixed association order mirrored
  * token-for-token in the SQL) or `ln` of such a value; constants are
  * embedded in the SQL as exact decimal expansions of the JVM double
  * ([[Bm25.sqlDouble]]) so both engines compute on identical bits.
  */
object Bm25 {

  /** Exact decimal expansion of a JVM double — embedding this in SQL makes
    * DuckDB parse back the identical binary64 value, so cross-engine
    * arithmetic starts from the same bits.
    */
  def sqlDouble(d: Double): String = new java.math.BigDecimal(d).toPlainString

  val DefaultK1 = 1.2
  val DefaultB = 0.75

  /** Top-k documents by BM25(terms). Output: (idCol, score) — score
    * rounded to 4 decimals AFTER the top-k cut (ranking uses the raw
    * double; ties broken by ascending id).
    */
  def topK(docs: DataFrame, idCol: String, textCol: String,
      terms: Seq[String], k: Int,
      k1: Double = DefaultK1, b: Double = DefaultB): DataFrame = {
    require(terms.nonEmpty, "BM25 needs at least one query term")
    // documents tokenize through lower(); an uppercase query term would
    // otherwise match NOTHING (tf = df = 0, every score 0.0, no error)
    val qTerms = terms.map(_.toLowerCase(java.util.Locale.ROOT))
    val tok = docs.select(col(idCol),
      split(trim(lower(col(textCol))), "\\s+").as("__ts"))

    // pass 1: one partial-aggregable scan → 1 row of corpus statistics
    val statAggs =
      count(lit(1)).as("__n") +:
      sum(size(col("__ts")).cast("long")).as("__sumdl") +:
      qTerms.zipWithIndex.map { case (t, i) =>
        sum(when(array_contains(col("__ts"), t), 1L).otherwise(0L))
          .as(s"__df$i")
      }
    val stats = tok.agg(statAggs.head, statAggs.tail: _*)

    // pass 2: score scan against the broadcast stats row
    val scored = tok.crossJoin(broadcast(stats))
    val dl = size(col("__ts")).cast("double")
    val avgdl = col("__sumdl").cast("double") / col("__n").cast("double")
    val termScores: Seq[Column] = qTerms.zipWithIndex.map { case (t, i) =>
      val tf = size(filter(col("__ts"), x => x === lit(t))).cast("double")
      val df = col(s"__df$i").cast("double")
      // idf is the +1 ("BM25+") form: always positive, so a term in >half
      // the corpus still contributes rather than flipping the ranking
      val idf = log(
        (col("__n").cast("double") - df + lit(0.5)) / (df + lit(0.5)) +
          lit(1.0))
      idf * tf * lit(k1 + 1.0) /
        (tf + lit(k1) * (lit(1.0 - b) + lit(b) * dl / avgdl))
    }
    val raw = termScores.reduce(_ + _)
    scored.select(col(idCol), raw.as("__raw"))
      .orderBy(col("__raw").desc, col(idCol))
      .limit(k)
      .select(col(idCol), round(col("__raw"), 4).as("score"))
  }

  /** The DuckDB replay of [[topK]] — same statistics, same score
    * expression in the same association order, constants embedded as
    * exact decimal expansions.
    */
  def oracleSql(idCol: String, rawTerms: Seq[String], k: Int,
      k1: Double = DefaultK1, b: Double = DefaultB,
      table: String = "documents", textCol: String = "text",
      matchedOnly: Boolean = false): String = {
    // mirror topK's query-term normalization so both sides match
    val terms = rawTerms.map(_.toLowerCase(java.util.Locale.ROOT))
    val dfCols = terms.zipWithIndex.map { case (t, i) =>
      s"sum(CASE WHEN list_contains(ts, '$t') THEN 1 ELSE 0 END) AS df$i"
    }.mkString(",\n         ")
    val termScores = terms.zipWithIndex.map { case (t, i) =>
      val tf = s"CAST(len(list_filter(ts, x -> x = '$t')) AS DOUBLE)"
      val df = s"CAST(df$i AS DOUBLE)"
      val idf =
        s"ln((CAST(n AS DOUBLE) - $df + 0.5) / ($df + 0.5) + 1.0)"
      s"""$idf * $tf * ${sqlDouble(k1 + 1.0)}
         |      / ($tf + ${sqlDouble(k1)} * (${sqlDouble(1.0 - b)}
         |         + ${sqlDouble(b)} * CAST(len(ts) AS DOUBLE)
         |           / (CAST(sumdl AS DOUBLE) / CAST(n AS DOUBLE))))""".stripMargin
    }.mkString("(", ")\n    + (", ")")
    s"""WITH tok AS MATERIALIZED (
       |  SELECT $idCol, regexp_split_to_array(trim(lower($textCol)), '\\s+') AS ts
       |  FROM $table
       |), st AS (
       |  SELECT count(*) AS n, sum(len(ts)) AS sumdl,
       |         $dfCols
       |  FROM tok
       |), sc AS (
       |  SELECT $idCol,
       |    $termScores AS raw
       |  FROM tok CROSS JOIN st
       |)
       |SELECT $idCol, score FROM (
       |  SELECT $idCol, round(raw, 4) AS score
       |  FROM sc${if (matchedOnly) " WHERE raw > 0" else ""}
       |  ORDER BY raw DESC, $idCol LIMIT $k
       |)""".stripMargin
  }
}
