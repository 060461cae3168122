package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Per-domain boilerplate removal — the crawl-cleaning pass that strips
  * the shared header/banner a site prepends to every page (RefinedWeb /
  * C4 keep line-level heuristics; at corpus scale the robust signal is
  * "the same k-token prefix dominates a domain").
  *
  * Detection: per `srcCol` group, the most frequent first-`k`-token
  * prefix, kept only if it covers at least `minShareBp` basis points of
  * the group's documents (a genuine banner covers most pages; an organic
  * prefix does not). Tie-break deterministic: highest count, then
  * lexicographically smallest prefix.
  *
  * Scale shape: prefix extraction is in-row (`slice` over the token
  * array); the count table is partial-aggregable and (source, prefix)-
  * bounded — group sizes never matter; the per-source argmax runs over
  * that aggregate (`min(struct(-cnt, prefix))`, no window over raw
  * rows); the tiny verdict table broadcasts back for the strip pass,
  * which is again map-only. Two exchanges total, both carrying
  * aggregates, never the corpus.
  */
object Boilerplate {

  /** Strip the detected per-source boilerplate prefix. Output: one row
    * per input doc — (idCol, srcCol, stripped, n_tokens, text_stripped)
    * where `stripped` flags removal and `n_tokens` counts the RETAINED
    * tokens. Docs shorter than `k` tokens are never candidates and never
    * stripped.
    */
  def stripCommonPrefix(docs: DataFrame, idCol: String, srcCol: String,
      textCol: String, k: Int, minShareBp: Int = 5000): DataFrame = {
    require(k >= 1, s"prefix length must be >= 1, got $k")
    require(minShareBp >= 1 && minShareBp <= 10000,
      s"minShareBp out of (0, 10000]: $minShareBp")
    val tok = docs.select(col(idCol), col(srcCol),
      split(trim(col(textCol)), "\\s+").as("__ts"))
    val withPfx = tok.withColumn("__p",
      when(size(col("__ts")) >= k,
        concat_ws(" ", slice(col("__ts"), 1, k))))
    val counts = withPfx.filter(col("__p").isNotNull)
      .groupBy(col(srcCol), col("__p"))
      .agg(count(lit(1)).as("__c"))
    val totals = tok.groupBy(col(srcCol)).agg(count(lit(1)).as("__n"))
    // deterministic per-source argmax over the aggregate: min of
    // (-count, prefix) = max count, then smallest prefix
    val verdict = counts
      .groupBy(col(srcCol))
      .agg(min(struct((-col("__c")).as("nc"), col("__p").as("p")))
        .as("__best"))
      .select(col(srcCol), (-col("__best.nc")).as("__c"),
        col("__best.p").as("__boil"))
      .join(totals, srcCol)
      .filter(col("__c") * lit(10000L) >= col("__n") * lit(minShareBp.toLong))
      .select(col(srcCol), col("__boil"))
    withPfx.join(broadcast(verdict), Seq(srcCol), "left")
      .select(col(idCol), col(srcCol),
        // null-safe: a source with no verdict (or a short doc) keeps
        // stripped = false, never null
        coalesce(col("__p") === col("__boil"), lit(false)).as("stripped"),
        col("__ts"), col("__boil"))
      .select(col(idCol), col(srcCol), col("stripped"),
        when(col("stripped"), size(col("__ts")) - k)
          .otherwise(size(col("__ts"))).cast("long").as("n_tokens"),
        when(col("stripped"),
            concat_ws(" ", expr(s"slice(__ts, ${k + 1}, size(__ts) - $k)")))
          .otherwise(concat_ws(" ", col("__ts"))).as("text_stripped"))
  }
}
