package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Token-budget corpus selection: keep the highest-quality documents whose
  * cumulative token count fits a budget — the selection step of a
  * quality-ranked, token-budgeted training run ("take the best B tokens").
  *
  * Semantics (exact greedy, fully deterministic): documents ordered by
  * (score DESC, id ASC); a document is selected iff the running token
  * total through it stays ≤ budget. Equivalently: every doc above the
  * boundary score is selected, and docs AT the boundary score are taken
  * in id order until the budget is exhausted.
  *
  * Scale shape — the naive form is a GLOBAL window over the corpus (one
  * sorted partition: the skew funnel). This instead:
  *   1. aggregates a per-SCORE histogram (bounded by the score domain —
  *      scores are 4-decimal-quantized, not corpus-sized);
  *   2. finds the boundary score + remaining budget with one cumulative
  *      window over that histogram and a 1-row reduction;
  *   3. runs the only doc-level window over the BOUNDARY SCORE's docs
  *      alone. (Worst case — the whole corpus sharing one score — this
  *      window is corpus-sized; that degenerate tie profile is inherent
  *      to exact greedy selection, and a real quality signal doesn't
  *      produce it.)
  *
  * All budget arithmetic is integer (token counts, cumulative sums,
  * `(total·pct) div 100`), so the selection is engine-replayable.
  */
object BudgetSelect {

  /** Select docs under a budget of `pctBudget`% of the corpus's total
    * weight. `scoreCol` must be quantized (bounded distinct values) and
    * `weightCol` integral. Output: (idCol, scoreCol, weightCol) of the
    * selected documents.
    */
  def select(docs: DataFrame, idCol: String, scoreCol: String,
      weightCol: String, pctBudget: Int): DataFrame = {
    require(pctBudget >= 0 && pctBudget <= 100, s"pctBudget=$pctBudget")
    // null score/weight refuse IN-PLAN: a NULL-scored doc would inflate
    // the budget while being unselectable (score >= t is NULL), and an
    // all-NULL corpus would silently select nothing; a NULL weight
    // would silently underfund the budget
    def guarded(c: String, what: String) =
      when(col(c).isNull, raise_error(lit(
        s"BudgetSelect: null $c — every document needs a $what " +
          "(filter or impute upstream)")).cast(docs.schema(c).dataType))
        .otherwise(col(c)).as(c)
    val d = docs.select(col(idCol), guarded(scoreCol, "quantized score"),
      guarded(weightCol, "token weight"))
    val hist = d.groupBy(col(scoreCol)).agg(sum(col(weightCol)).as("__hw"))
    // the corpus total is the histogram's own full-frame sum — deriving
    // it here (same tiny window partitioning) saves the second
    // full-corpus aggregate scan a separate d.agg(sum) would cost
    val cum = hist
      .withColumn("__tw", sum(col("__hw")).over(Window
        .orderBy(col(scoreCol).desc)
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
      .withColumn("__b", expr(s"(__tw * $pctBudget) div 100"))
      .withColumn("__cm",
        sum(col("__hw")).over(Window.orderBy(col(scoreCol).desc)))
    // 1 row: budget, tokens spent on fully-selected scores, the lowest
    // fully-selected score t, and the boundary (first over-budget) score
    val bstats = cum.agg(
      max(col("__b")).as("__b"),
      max(when(col("__cm") <= col("__b"), col("__cm"))).as("__spent"),
      min(when(col("__cm") <= col("__b"), col(scoreCol))).as("__t"),
      max(when(col("__cm") > col("__b"), col(scoreCol))).as("__b0"))

    val sel = d.crossJoin(broadcast(bstats))
    val full = sel.where(col("__t").isNotNull && col(scoreCol) >= col("__t"))
    val boundary = sel
      .where(col("__b0").isNotNull && col(scoreCol) === col("__b0"))
      .withColumn("__cw", sum(col(weightCol))
        .over(Window.partitionBy(col(scoreCol)).orderBy(col(idCol))))
      .where(col("__cw") <= col("__b") - coalesce(col("__spent"), lit(0L)))
    full.select(col(idCol), col(scoreCol), col(weightCol))
      .union(boundary.select(col(idCol), col(scoreCol), col(weightCol)))
  }

  /** DuckDB replay of [[select]] over a `d(doc_id, score, w)` CTE the
    * caller prepends (same histogram → boundary → boundary-window steps).
    */
  def oracleSqlTail(idCol: String, pctBudget: Int,
      outWeightCol: String): String =
    s""", tot AS (SELECT sum(w) AS tw FROM d
       |), hist AS (SELECT score, sum(w) AS hw FROM d GROUP BY 1
       |), cum AS (
       |  SELECT score, sum(hw) OVER (ORDER BY score DESC) AS cm,
       |         (SELECT (tw * $pctBudget) // 100 FROM tot) AS b
       |  FROM hist
       |), bs AS (
       |  SELECT max(b) AS b,
       |         max(CASE WHEN cm <= b THEN cm END) AS spent,
       |         min(CASE WHEN cm <= b THEN score END) AS t,
       |         max(CASE WHEN cm > b THEN score END) AS b0
       |  FROM cum
       |)
       |SELECT $idCol, score, w AS $outWeightCol
       |FROM d, bs WHERE t IS NOT NULL AND score >= t
       |UNION ALL
       |SELECT $idCol, score, $outWeightCol FROM (
       |  SELECT $idCol, score, w AS $outWeightCol,
       |         sum(w) OVER (ORDER BY $idCol) AS cw,
       |         b - coalesce(spent, 0) AS r
       |  FROM d, bs WHERE b0 IS NOT NULL AND score = b0
       |) WHERE cw <= r""".stripMargin
}
