package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Interval-containment (range) join: left rows matched to right
  * intervals with `start <= ts < end` on the same key — the other
  * temporal join Spark has no native operator for.
  *
  * Plan — grain bucketing, NOT an inequality join: time is cut into
  * fixed grains; each right interval explodes into the grains it covers
  * (⌈len/grain⌉ rows, ~1-2 when `grain` matches the typical interval
  * length), each left row hashes into its one grain, and an EQUI-join on
  * (key, grain) + an exact containment filter replaces the
  * nested-loop/cartesian plan Spark would otherwise pick for an
  * inequality condition. Shuffle volume is |L| + |R|·⌈len/grain⌉; choose
  * `grain` on the order of the typical interval.
  */
object RangeJoin {

  /** Exact 64-bit floor division — `floor(c / g)` in double arithmetic
    * silently mis-buckets |c| > 2^53 (raw nanos exceed that), so bucketing
    * stays in integer space: subtract the positive modulus (making the
    * numerator an exact multiple of `g`), then integer-divide.
    */
  private[operators] def floorDivCol(c: Column, g: Long): Column = {
    val cl = c.cast("long")
    val exact = cl - pmod(cl, lit(g))
    // The numerator is an exact multiple of g, so the decimal quotient is
    // integral and the long cast is lossless (double division is not: it
    // rounds the 64-bit numerator to 53-bit mantissa first).
    (exact.cast("decimal(38,0)") / lit(g)).cast("long")
  }

  /** @param left  rows with `key` and instant column `ts`
    * @param right rows with `key` and interval columns `start` (incl.)
    *              and `end` (excl.); all time columns in one unit.
    *              Degenerate intervals (`end <= start`) match nothing and
    *              are filtered BEFORE the explode — without the guard one
    *              corrupt row with `end << start` would otherwise expand
    *              into a descending-sequence bucket blowup.
    * @param grain bucket width in the same unit
    */
  def join(left: DataFrame, right: DataFrame, key: String, ts: String,
      start: String, end: String, grain: Long): DataFrame = {
    require(grain > 0, "grain must be positive")
    // reserved-name + ambiguity guards (same policy as AsOfJoin's
    // requireNoReserved): a caller `_g` would be silently overwritten by
    // withColumn and dropped from the output; any other column present on
    // BOTH sides makes the containment filter's col(ts)/col(start)
    // references ambiguous and fails analysis with an unhelpful message.
    require(!left.columns.contains("_g") && !right.columns.contains("_g"),
      "RangeJoin reserves the column name _g; rename it on the input")
    val shared = left.columns.toSet.intersect(right.columns.toSet) - key
    require(shared.isEmpty,
      s"RangeJoin: columns ${shared.toSeq.sorted.mkString(", ")} exist on " +
        s"both sides — only the join key '$key' may be shared; rename the rest")
    val lb = left.withColumn("_g", floorDivCol(col(ts), grain))
    val rb = right
      .filter(col(end) > col(start))
      .withColumn("_g", explode(sequence(
        floorDivCol(col(start), grain),
        floorDivCol(col(end) - 1, grain))))
    lb.join(rb, Seq(key, "_g"))
      .filter(col(ts) >= col(start) && col(ts) < col(end))
      .drop("_g")
  }
}
