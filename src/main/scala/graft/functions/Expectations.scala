package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality expectations — the pre-flight gate a 100 TB
  * training-data pipeline runs before (and after) every stage: declare
  * constraints, evaluate them ALL in one aggregation pass over the
  * corpus, get a small verdict table. Inspired by the constraint-
  * suite shape of data-validation libraries (completeness / uniqueness /
  * range / membership), re-expressed as a single Spark aggregate.
  *
  * Scale shape: every check compiles to a conditional aggregate column
  * in ONE `df.agg(...)` — one scan, partial aggregation map-side, a
  * 1-row result however many checks are declared (uniqueness adds
  * count-distinct, which Spark plans via expand — still one pass).
  * Verdict arithmetic is integer basis points (`x · 10000 div n`), so
  * the report hash-matches across engines.
  */
object Expectations {

  sealed trait Check { def name: String }

  /** share of non-null values in `col` must be >= minBp basis points. */
  final case class Complete(col: String, minBp: Long) extends Check {
    def name = s"complete($col)>=$minBp"
  }

  /** every non-null value of `col` occurs exactly once. */
  final case class Unique(col: String) extends Check {
    def name = s"unique($col)"
  }

  /** share of non-null values OUTSIDE [lo, hi] must be <= maxViolBp. */
  final case class InRange(col: String, lo: Long, hi: Long, maxViolBp: Long)
      extends Check {
    def name = s"in_range($col,$lo,$hi)<=$maxViolBp"
  }

  /** share of non-null values outside the allowed set <= maxViolBp. */
  final case class InSet(col: String, allowed: Seq[String], maxViolBp: Long)
      extends Check {
    def name = s"in_set($col)<=$maxViolBp"
  }

  /** at least `min` rows. */
  final case class MinCount(min: Long) extends Check {
    def name = s"count>=$min"
  }

  /** One-pass verdict table: (check, metric_bp, bound_bp, pass).
    * metric_bp is the measured ratio in basis points (or the raw count
    * for MinCount); pass is the check's verdict.
    */
  def report(df: DataFrame, checks: Seq[Check]): DataFrame = {
    val spark = df.sparkSession
    val aggs: Seq[Column] = count(lit(1)).as("__n") +: checks.zipWithIndex.map {
      case (Complete(c, _), i) => count(col(c)).as(s"__m$i")
      case (Unique(c), i) =>
        // distinct and non-null counts both needed; pack via struct-free
        // twin columns (the second lands after the fixed block below)
        countDistinct(col(c)).as(s"__m$i")
      // coalesce: sum over ZERO rows is null, and the gate must report
      // an empty input's failures, not NPE on them
      case (InRange(c, lo, hi, _), i) =>
        coalesce(sum(when(col(c).isNotNull &&
          (col(c) < lo || col(c) > hi), 1L).otherwise(0L)), lit(0L))
          .as(s"__m$i")
      case (InSet(c, allowed, _), i) =>
        coalesce(sum(when(col(c).isNotNull && !col(c).isin(allowed: _*), 1L)
          .otherwise(0L)), lit(0L)).as(s"__m$i")
      case (MinCount(_), i) => count(lit(1)).as(s"__m$i")
    }
    val extra: Seq[Column] = checks.zipWithIndex.collect {
      case (Unique(c), i) => count(col(c)).as(s"__nn$i")
      case (InRange(c, _, _, _), i) => count(col(c)).as(s"__nn$i")
      case (InSet(c, _, _), i) => count(col(c)).as(s"__nn$i")
    }
    val row = df.agg(aggs.head, (aggs.tail ++ extra): _*).collect()(0)
    def l(name: String): Long = row.getLong(row.fieldIndex(name))
    val n = l("__n")
    // CONSISTENT vacuous semantics: share-of-good checks (Complete,
    // Unique) read an empty denominator as fully satisfied (10000 bp —
    // nothing violates), and share-of-VIOLATION checks (InRange, InSet)
    // read it as zero violations (0 bp) — an all-null column passes an
    // InRange instead of reporting a phantom 100% violation rate. Use
    // MinCount to reject empty inputs outright.
    def bp(x: Long, of: Long): Long = if (of == 0) 10000L else x * 10000L / of
    def violBp(x: Long, of: Long): Long = if (of == 0) 0L else x * 10000L / of
    val verdicts = checks.zipWithIndex.map { case (chk, i) =>
      chk match {
        case Complete(_, minBp) =>
          val m = bp(l(s"__m$i"), n)
          (chk.name, m, minBp, m >= minBp)
        case Unique(_) =>
          val m = bp(l(s"__m$i"), l(s"__nn$i"))
          (chk.name, m, 10000L, m == 10000L)
        case InRange(_, _, _, maxBp) =>
          val m = violBp(l(s"__m$i"), l(s"__nn$i"))
          (chk.name, m, maxBp, m <= maxBp)
        case InSet(_, _, maxBp) =>
          val m = violBp(l(s"__m$i"), l(s"__nn$i"))
          (chk.name, m, maxBp, m <= maxBp)
        case MinCount(min) =>
          (chk.name, l(s"__m$i"), min, l(s"__m$i") >= min)
      }
    }
    import spark.implicits._
    verdicts.toDF("check", "metric_bp", "bound_bp", "pass")
  }

  /** Gate form: throws if any check fails (pipeline pre-flight). */
  def enforce(df: DataFrame, checks: Seq[Check]): Unit = {
    val bad = report(df, checks).filter(!col("pass")).collect()
    if (bad.nonEmpty)
      throw new IllegalStateException("expectations failed: " +
        bad.map(r => s"${r.getString(0)} metric=${r.getLong(1)}")
          .mkString("; "))
  }
}
