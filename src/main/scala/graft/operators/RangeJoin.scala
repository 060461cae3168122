package graft.operators

import org.apache.spark.sql.DataFrame
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

  /** @param left  rows with `key` and instant column `ts`
    * @param right rows with `key` and interval columns `start` (incl.)
    *              and `end` (excl.); all time columns in one unit
    * @param grain bucket width in the same unit
    */
  def join(left: DataFrame, right: DataFrame, key: String, ts: String,
      start: String, end: String, grain: Long): DataFrame = {
    require(grain > 0, "grain must be positive")
    val lb = left.withColumn("_g", floor(col(ts) / grain).cast("long"))
    val rb = right.withColumn("_g", explode(sequence(
      floor(col(start) / grain).cast("long"),
      floor((col(end) - 1) / grain).cast("long"))))
    lb.join(rb, Seq(key, "_g"))
      .filter(col(ts) >= col(start) && col(ts) < col(end))
      .drop("_g")
  }
}
