package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for joins on hot keys — the classic salting pattern
  * (SURVEY scale requirements; complements AQE's runtime skew-join
  * splitting, which only fires when statistics detect the skew).
  *
  * `saltedJoin`: the build side is replicated `salt` times (one row per
  * salt value), the probe side gets a deterministic per-row salt, and the
  * join key becomes (key, salt) — a hot key's rows spread over `salt`
  * reducers instead of one. Replication cost is salt × |build side|, so use
  * it with a small dimension or a pre-filtered build side.
  */
object Skew {

  /** Inner equi-join of `probe` (large, possibly skewed) with `build`
    * (small) on `key`, spreading each probe key over `salt` partitions.
    */
  def saltedJoin(probe: DataFrame, build: DataFrame, key: String,
      salt: Int): DataFrame = {
    // deterministic per-row salt: hash of all probe columns spreads rows
    // of the same hot key (identical rows collapse — acceptable: they
    // carry identical work)
    val salted = probe.withColumn("_salt",
      pmod(xxhash64(probe.columns.map(col).toIndexedSeq: _*), lit(salt)))
    val replicated = build
      .withColumn("_salt", explode(sequence(lit(0), lit(salt - 1))))
      .withColumn("_salt", col("_salt").cast("long"))
    salted.join(replicated, Seq(key, "_salt")).drop("_salt")
  }

  /** Two-phase (salted partial + final) aggregation — for aggregation
    * functions that are not algebraic and therefore get no map-side combine
    * from Spark (e.g. exact `collect_set` cardinality per hot key).
    */
  def twoPhaseCountDistinct(df: DataFrame, key: String, value: String,
      salt: Int): DataFrame =
    df.withColumn("_salt", pmod(xxhash64(col(value)), lit(salt)))
      .groupBy(col(key), col("_salt"))
      .agg(countDistinct(col(value)).as("_partial"))
      .groupBy(col(key))
      .agg(sum(col("_partial")).as("n_distinct"))
}
