package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** AS-OF join: each left row gains the latest right-side value with
  * `rightTs <= leftTs` for the same key — the temporal lookup every
  * changelog analytics needs (prices at trade time, dimension state at
  * event time) that Spark has no native operator for.
  *
  * Plan — the distributed union+window lowering, NOT a range join:
  * tag both sides, union, ONE shuffle on the key, sort within partitions
  * by (ts, side, tiebreak), then `last(value, ignoreNulls)` over an
  * unbounded-preceding window carries the most recent right value forward
  * into each left row. Cost is one shuffle of |L| + |R| rows regardless
  * of temporal density — a naive inequality join explodes to |L| × |R|
  * candidate pairs before aggregation, which is what kills range joins at
  * 100 TB.
  *
  * Tie semantics are EXPLICIT (and replayed identically by the oracle):
  * at equal timestamps the right row sorts before the left row (as-of
  * includes same-instant values), and multiple right rows at one instant
  * resolve by the `tiebreak` column (latest wins).
  */
object AsOfJoin {

  /** @param left      fact rows (any columns; must contain `key` and `ts`)
    * @param right     lookup rows: `key`, `ts`, the value columns, and
    *                  `tiebreak` for deterministic same-instant ordering
    * @param key       equi-join / partition column
    * @param ts        event-time column (same unit both sides)
    * @param valueCols right-side columns to carry; appear as `asof_<name>`
    * @param tiebreak  right-side ordering column within one instant
    */
  /** The lowering reserves `_side`, `_tie`, `_v_<col>` and emits
    * `asof_<col>` — caller columns under those names would be silently
    * replaced by `withColumn`, so they are rejected up front.
    */
  private def requireNoReserved(cols: Seq[String], side: String): Unit = {
    val clash = cols.filter(c =>
      c == "_side" || c == "_tie" || c.startsWith("_v_") || c.startsWith("asof_"))
    require(clash.isEmpty,
      s"$side columns ${clash.mkString(", ")} collide with AsOfJoin's " +
        "reserved names (_side, _tie, _v_*, asof_*)")
  }

  def join(left: DataFrame, right: DataFrame, key: String, ts: String,
      valueCols: Seq[String], tiebreak: String): DataFrame = {
    requireNoReserved(left.columns.toSeq, "left")
    requireNoReserved(right.columns.toSeq, "right")
    require(right.schema(tiebreak).dataType
        .isInstanceOf[org.apache.spark.sql.types.NumericType],
      s"tiebreak column '$tiebreak' must be numeric, found " +
        s"${right.schema(tiebreak).dataType.simpleString} (a silent cast " +
        "would null it out and make same-instant resolution nondeterministic)")
    val leftCols = left.columns.toSeq
    val l = left
      .withColumn("_side", lit(1))
      .withColumn("_tie", lit(Long.MaxValue))
    var r = right.select(
      (Seq(col(key), col(ts), col(tiebreak).cast("long").as("_tie")) ++
        valueCols.map(c => col(c).as(s"_v_$c"))): _*)
      .withColumn("_side", lit(0))
    // align schemas for the union
    val missingInR = l.columns.toSet -- r.columns.toSet
    missingInR.foreach(c => r = r.withColumn(c, lit(null)))
    var u = r
    val missingInL = r.columns.toSet -- l.columns.toSet
    var lAligned = l
    missingInL.foreach(c => lAligned = lAligned.withColumn(c, lit(null)))
    u = lAligned.select(r.columns.map(col): _*).unionByName(r)
    // right rows first at equal ts (as-of includes same-instant values);
    // among right rows at one instant the highest tiebreak wins
    val w = Window.partitionBy(col(key))
      .orderBy(col(ts), col("_side"), col("_tie"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = valueCols.foldLeft(u) { (df, c) =>
      df.withColumn(s"asof_$c", last(col(s"_v_$c"), ignoreNulls = true).over(w))
    }
    carried.filter(col("_side") === 1)
      .select((leftCols.map(col) ++ valueCols.map(c => col(s"asof_$c"))): _*)
  }
}
