package graft.core

import org.apache.spark.sql.DataFrame

/** Scan-parallelism repair for CPU-DENSE kernels (optimization guide
  * §2.5, "input skew: … repartition immediately after the read").
  *
  * A scan's task count is decided by bytes (`maxPartitionBytes` over
  * row-group boundaries), which is the wrong cost model for operators
  * whose per-row work dwarfs the row's bytes — a quadratic per-row
  * fanout (Gram upper-triangle products: d(d+1)/2 multiplies per row) or
  * a d×w sketch update per token runs SERIALLY when the input is one
  * small file with one row group, even though the work would keep every
  * core busy. [[ifStarved]] round-robin-repartitions to the session's
  * default parallelism, but ONLY when the plan is actually starved
  * (fewer input partitions than half the cores) — at production scale
  * inputs carry ≥ cores splits and this is an exact no-op. The decision
  * derives from the live partition count, never a local constant, so
  * the same code is right at sf0.001 and at 100 TB.
  *
  * Apply ONLY to measured CPU-dense paths: for cheap per-row kernels the
  * shuffle costs more than it recovers (measured on minhash signatures:
  * repartition(32) made the pass ~2x SLOWER; on the Gram pass it made
  * it ~2.5x faster). Determinism: Spark sorts partitions before a
  * round-robin repartition (`spark.sql.execution.sortBeforeRepartition`,
  * on by default), so retried tasks reproduce the same placement; every
  * caller's result is additionally partition-order-insensitive integer
  * math.
  */
object Spread {

  def ifStarved(df: DataFrame): DataFrame = {
    val cores = df.sparkSession.sparkContext.defaultParallelism
    // .rdd plans the frame without executing it; for the scan-shaped
    // inputs at the call sites this is milliseconds
    if (df.rdd.getNumPartitions * 2 < cores) df.repartition(cores) else df
  }
}
