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
  *
  * Skew: [[join]] partitions by `key` alone — one hot key (a user with
  * tens of millions of events) sorts |L|+|R| of its rows in ONE task.
  * [[joinBucketed]] is the skew-safe variant: it grain-buckets time
  * WITHIN each key so a hot key spreads over time-range/grain tasks,
  * carrying the last right value across bucket boundaries (the RangeJoin
  * grain trick applied to as-of state). Same answer, one extra small
  * bucket-level shuffle.
  */
object AsOfJoin {

  /** The lowering reserves `_side`, `_tie`, `_v_<col>` (plus `_b`,
    * `_bl_<col>`, `_ci_<col>` in the bucketed variant) and emits
    * `asof_<col>` — caller columns under those names would be silently
    * replaced by `withColumn`, so they are rejected up front.
    */
  private def requireNoReserved(cols: Seq[String], side: String): Unit = {
    val clash = cols.filter(c =>
      c == "_side" || c == "_tie" || c == "_b" || c.startsWith("_v_") ||
        c.startsWith("_bl_") || c.startsWith("_ci_") || c.startsWith("asof_"))
    require(clash.isEmpty,
      s"$side columns ${clash.mkString(", ")} collide with AsOfJoin's " +
        "reserved names (_side, _tie, _b, _v_*, _bl_*, _ci_*, asof_*)")
  }

  /** Tag, project and union the two sides: right rows carry `_side = 0`,
    * the tiebreak and the value columns as `_v_<c>`; left rows carry
    * `_side = 1` with `_tie = MaxValue` (a left row never out-sorts a
    * same-instant right row).
    */
  private def taggedUnion(left: DataFrame, right: DataFrame, key: String,
      ts: String, valueCols: Seq[String], tiebreak: String): DataFrame = {
    requireNoReserved(left.columns.toSeq, "left")
    requireNoReserved(right.columns.toSeq, "right")
    require(right.schema(tiebreak).dataType
        .isInstanceOf[org.apache.spark.sql.types.NumericType],
      s"tiebreak column '$tiebreak' must be numeric, found " +
        s"${right.schema(tiebreak).dataType.simpleString} (a silent cast " +
        "would null it out and make same-instant resolution nondeterministic)")
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
    val missingInL = r.columns.toSet -- l.columns.toSet
    var lAligned = l
    missingInL.foreach(c => lAligned = lAligned.withColumn(c, lit(null)))
    lAligned.select(r.columns.toIndexedSeq.map(col): _*).unionByName(r)
  }

  /** @param left      fact rows (any columns; must contain `key` and `ts`)
    * @param right     lookup rows: `key`, `ts`, the value columns, and
    *                  `tiebreak` for deterministic same-instant ordering
    * @param key       equi-join / partition column
    * @param ts        event-time column (same unit both sides)
    * @param valueCols right-side columns to carry; appear as `asof_<name>`
    * @param tiebreak  right-side ordering column within one instant
    */
  def join(left: DataFrame, right: DataFrame, key: String, ts: String,
      valueCols: Seq[String], tiebreak: String): DataFrame = {
    val leftCols = left.columns.toSeq
    val u = taggedUnion(left, right, key, ts, valueCols, tiebreak)
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

  /** Skew-safe AS-OF join: identical semantics to [[join]], but the
    * window partitions by (key, time-bucket) so one hot key parallelizes
    * across time-range/grain tasks instead of sorting its whole history
    * in one.
    *
    * Three stages, all distributed:
    *  1. per (key, bucket): the last right value of the bucket, per value
    *     column with last-NON-NULL semantics (`max_by` over rows where
    *     the column is set) — one small row per touched bucket;
    *  2. carry-in per (key, bucket): a window over the BUCKET-LEVEL rows
    *     (at most time-range/grain per key — thousands, not millions)
    *     carries stage 1 forward, giving each bucket the latest right
    *     value from all strictly-earlier buckets;
    *  3. within each (key, bucket): the [[join]] window, coalesced with
    *     the bucket's carry-in for left rows preceding any in-bucket
    *     right row.
    *
    * Choose `grain` so a hot key's densest bucket fits a task — e.g. an
    * hour of a key that peaks at ~100k events/hour.
    */
  def joinBucketed(left: DataFrame, right: DataFrame, key: String, ts: String,
      valueCols: Seq[String], tiebreak: String, grain: Long): DataFrame = {
    require(grain > 0, "grain must be positive")
    val leftCols = left.columns.toSeq
    val u = taggedUnion(left, right, key, ts, valueCols, tiebreak)
      .withColumn("_b", RangeJoin.floorDivCol(col(ts), grain))
    // stage 1: last right value per touched (key, bucket), per column;
    // max_by skips rows whose ordering expr is null, giving last-non-null
    def bucketLastCol(c: String): Column =
      max_by(col(s"_v_$c"),
        when(col(s"_v_$c").isNotNull, struct(col(ts), col("_tie"))))
        .as(s"_bl_$c")
    val bucketLast = u.filter(col("_side") === 0)
      .groupBy(col(key), col("_b"))
      .agg(bucketLastCol(valueCols.head), valueCols.tail.map(bucketLastCol): _*)
    // stage 2: carry bucket-level state forward across buckets of a key —
    // every bucket any row touches appears, right-less buckets included
    val buckets = u.select(col(key), col("_b")).distinct()
      .join(bucketLast, Seq(key, "_b"), "left")
    val wc = Window.partitionBy(col(key)).orderBy(col("_b"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val carryIn = valueCols.foldLeft(buckets) { (df, c) =>
      df.withColumn(s"_ci_$c", last(col(s"_bl_$c"), ignoreNulls = true).over(wc))
    }.select((Seq(col(key), col("_b")) ++ valueCols.map(c => col(s"_ci_$c"))): _*)
    // stage 3: the in-bucket window, seeded by the carry-in
    val w = Window.partitionBy(col(key), col("_b"))
      .orderBy(col(ts), col("_side"), col("_tie"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = valueCols.foldLeft(u.join(carryIn, Seq(key, "_b"))) { (df, c) =>
      df.withColumn(s"asof_$c",
        coalesce(last(col(s"_v_$c"), ignoreNulls = true).over(w), col(s"_ci_$c")))
    }
    carried.filter(col("_side") === 1)
      .select((leftCols.map(col) ++ valueCols.map(c => col(s"asof_$c"))): _*)
  }
}
