package graft.streaming

import org.apache.spark.sql.{Dataset, GraftSqlBridge}

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
  * `spark.graft.streaming.shufflePartitions`, when set, applies to
  * streaming query STARTS only — via a CLONED SparkSession per start
  * (shared SparkContext and shared state, copied session conf) that owns
  * the streaming width, so batch plans in the caller's session can NEVER
  * observe it: the caller's conf is not touched at any point. (Until r10
  * this was a set/restore on the caller's conf under a global lock, with
  * a documented residual window for concurrently-planned batch queries;
  * the clone removes both the window and the lock.) Unset ⇒ no behavior
  * change and no clone.
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
  *
  * NOTE for memory-sink callers: the sink's temp view registers in the
  * session that STARTS the query — when scoping applied, that is the
  * clone, so read the table back through `query.sparkSession`, not the
  * original session (StreamSupport.runToMemorySink and StreamCollector
  * do).
  */
object StreamConf {

  val Key = "spark.graft.streaming.shufflePartitions"
  private val ShuffleKey = "spark.sql.shuffle.partitions"

  /** Run `start` on `stream` rebound (when [[Key]] is set) to a cloned
    * session whose `spark.sql.shuffle.partitions` is the streaming
    * width. The query started inside `start` captures its state-store
    * partitioning from the clone's conf; the original session's conf is
    * never mutated, so concurrent batch planning keeps the batch width
    * unconditionally.
    */
  def scoped[T, A](stream: Dataset[T])(start: Dataset[T] => A): A = {
    val s = stream.sparkSession
    s.conf.getOption(Key) match {
      case None => start(stream)
      case Some(n) =>
        val child = GraftSqlBridge.cloneSession(s)
        child.conf.set(ShuffleKey, n)
        start(GraftSqlBridge.rebind(stream, child))
    }
  }
}
