package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Inverted-index posting construction — the index-build side of the
  * retrieval stack ([[Bm25]] is the query side). Emits one posting per
  * (term, document): term frequency and first position, the minimum a
  * positional index needs (phrase queries extend the same plan with a
  * positions array; the aggregate stays partial-aggregable either way).
  *
  * Scale shape: tokenize + positional explode are in-row; the vocabulary
  * filter is a LITERAL in-set predicate applied in the scan stage
  * (plan-gated), so the only exchange carries postings for the requested
  * vocabulary, not the corpus token stream. tf/first_pos both combine
  * map-side (partial count/min). Building the FULL index is this plan
  * minus the filter, partitioned by term hash — the hot-term skew story
  * is then the same per-bucket cap + quarantine discipline as
  * [[BucketedPairs]].
  */
object Postings {

  /** Postings for the `terms` vocabulary: (term, doc_id, tf, first_pos)
    * with 1-based positions under the [[Bm25]] tokenizer (lower +
    * whitespace split) so index and scorer agree on terms.
    */
  def forTerms(docs: DataFrame, idCol: String, textCol: String,
      terms: Seq[String]): DataFrame = {
    require(terms.nonEmpty, "postings need a vocabulary")
    val vocab = terms.map(_.toLowerCase(java.util.Locale.ROOT))
    docs.select(col(idCol),
        posexplode(split(trim(lower(col(textCol))), "\\s+")))
      .select(col("col").as("term"), col(idCol),
        (col("pos") + 1).cast("long").as("p"))
      .filter(col("term").isin(vocab: _*))
      .groupBy(col("term"), col(idCol))
      .agg(count(lit(1)).as("tf"), min(col("p")).as("first_pos"))
  }

  /** DuckDB replay of [[forTerms]]: the shingleSql positional idiom
    * (index vector by an unnested range) under the same tokenizer.
    */
  def oracleSql(idCol: String, terms: Seq[String],
      table: String = "documents", textCol: String = "text"): String = {
    val vocab = terms.map(_.toLowerCase(java.util.Locale.ROOT))
      .map(t => s"'$t'").mkString(", ")
    s"""SELECT t.toks[CAST(t.i AS INT)] AS term, $idCol,
       |       CAST(count(*) AS BIGINT) AS tf,
       |       CAST(min(t.i) AS BIGINT) AS first_pos
       |FROM (
       |  SELECT $idCol,
       |         regexp_split_to_array(trim(lower($textCol)), '\\s+') AS toks,
       |         unnest(range(1, len(regexp_split_to_array(trim(lower($textCol)), '\\s+')) + 1)) AS i
       |  FROM $table) t
       |WHERE t.toks[CAST(t.i AS INT)] IN ($vocab)
       |GROUP BY 1, 2""".stripMargin
  }
}
