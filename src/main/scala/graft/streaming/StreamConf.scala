package graft.streaming

import org.apache.spark.sql.SparkSession

/** Streaming state-partition sizing. A stateful streaming query fixes its
  * state partitioning from `spark.sql.shuffle.partitions` at FIRST batch,
  * and every micro-batch then commits one state-store delta per
  * partition — per-batch overhead is O(state partitions) regardless of
  * data volume. The right number is therefore a STREAMING-specific
  * choice: ~2× total executor cores on a cluster, but far LOWER than the
  * batch shuffle width when micro-batches are small (local replay
  * harnesses, low-volume topics), where 32 partitions of per-batch
  * store-commit overhead dominated measured query time by ~30%.
  *
  * `spark.graft.streaming.shufflePartitions`, when set, is scoped over
  * streaming query STARTS only — batch plans in the same session keep
  * the session's shuffle width. Unset ⇒ no behavior change.
  *
  * Which starts need it: only queries with STATEFUL operators
  * (aggregations, [de]dup state, flatMapGroupsWithState) materialize
  * state stores — the memory-sink replay harness and CachedView here.
  * Writer-returning APIs (`CommitLogFamily.sink`,
  * `BucketedSnapshotStore.replicate`) are stateless `foreachBatch`
  * sinks: their per-batch work plans as BATCH queries inside the
  * lambda, so the streaming width never applies and their callers need
  * no scoping (the wraps on `Transformations.run` and GraftOperator's
  * observers are defensive no-ops for the same reason).
  */
object StreamConf {

  val Key = "spark.graft.streaming.shufflePartitions"
  private val ShuffleKey = "spark.sql.shuffle.partitions"

  // serializes every scoped start: two unsynchronized set/restore pairs
  // interleaving (A reads 32, sets 8; B reads 8; A restores 32; B
  // "restores" 8) would leave the SESSION's batch width permanently
  // shrunk. One global lock — streaming query STARTS are rare and fast
  private val lock = new Object

  /** Run `start` (which must START the streaming query — the conf is
    * read at query planning) under the streaming shuffle width, then
    * restore the session's batch width. Starts are serialized on a
    * process-wide lock so concurrent scoped starts cannot corrupt the
    * restored value. Residual window: a BATCH query planned by another
    * thread during a start observes the streaming width — acceptable
    * for the short planning window (AQE re-coalesces partitions at
    * runtime); a deployment that plans heavy batch queries concurrently
    * with streaming starts should unset [[Key]] instead.
    */
  def scoped[A](s: SparkSession)(start: => A): A =
    s.conf.getOption(Key) match {
      case None => start
      case Some(n) => lock.synchronized {
        val prev = s.conf.get(ShuffleKey)
        s.conf.set(ShuffleKey, n)
        try start finally s.conf.set(ShuffleKey, prev)
      }
    }
}
