package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Lineage truncation for iterative loops (connected components,
  * PageRank, BPE rounds): each round MUST cut its logical plan back to
  * a leaf or Catalyst analysis grows with the iteration count.
  *
  * Two cuts exist, and the difference only matters on a real cluster:
  *
  *  - `localCheckpoint` stores the materialized partitions in EXECUTOR
  *    storage — fast, but the blocks die with an executor, and a
  *    truncated plan has no lineage left to recompute them: an executor
  *    loss mid-loop kills the job. Fine on local[*]; a liability on a
  *    1000-executor run where losing one machine in an hour is routine.
  *  - reliable `checkpoint()` writes partitions to the configured
  *    fault-tolerant checkpoint directory (HDFS/object store) — an
  *    executor loss re-reads the blocks from storage.
  *
  * [[cut]] picks per the `spark.graft.checkpoint.dir` conf: set it on a
  * cluster (any Hadoop-FS path all executors can reach) to make every
  * iterative loop in the engine fault-tolerant; leave it unset for the
  * low-latency local default. One knob, applied at every loop site.
  */
object Lineage {

  /** Conf key naming a fault-tolerant directory for reliable
    * checkpoints; unset = executor-local checkpointing.
    */
  val ConfKey = "spark.graft.checkpoint.dir"

  private def ensureCheckpointDir(spark: SparkSession, dir: String): Unit = {
    // setCheckpointDir resolves to a per-app UUID subdirectory, so the
    // raw conf value never equals getCheckpointDir — set only when none
    // is configured yet (the first configured dir wins for the app's
    // lifetime; call sc.setCheckpointDir directly to move it).
    val sc = spark.sparkContext
    if (sc.getCheckpointDir.isEmpty) sc.setCheckpointDir(dir)
  }

  /** Truncate `df`'s lineage: reliable [[DataFrame.checkpoint]] when
    * [[ConfKey]] is set, `localCheckpoint` otherwise. `eager = false`
    * defers materialization to the caller's next action (one job per
    * loop round instead of two) — LOCAL PATH ONLY. The reliable path is
    * DELIBERATELY ALWAYS EAGER, so `eager = false` is a best-effort
    * hint, not a guarantee: loop call sites (Centrality, BpeTrain,
    * Clusters) save one driver barrier per round only in local mode.
    *
    * Why lazy reliable checkpointing would be a pessimization, not an
    * optimization: Spark writes a reliable checkpoint in a SEPARATE job
    * that runs after the first job over the RDD completes
    * (ReliableRDDCheckpointData.doCheckpoint). Deferring to the caller's
    * next action therefore still costs two jobs per round — and unless
    * the frame is pinned across both, the write job RECOMPUTES the full
    * plan, doubling each round's task work at exactly the scale the
    * reliable path exists for. Releasing that pin needs a deterministic
    * point after the write, which only the eager shape provides. Eager
    * persist → checkpoint → unpersist is the cheapest fault-tolerant
    * round: one compute into cache, one cache-read write, cache freed.
    *
    * Reliable-path shape: persist → eager checkpoint → unpersist.
    * A bare `checkpoint()` COMPUTES THE PLAN TWICE (Spark writes the
    * checkpoint in a second job; without a persist that job recomputes
    * from scratch — the RDD.checkpoint scaladoc's own warning), which
    * would double every loop round's cost on a cluster. The persist
    * bounds it: one compute into executor cache, one cache-read write
    * job, cache released. Always eager so the unpersist can land
    * deterministically.
    *
    * Cleanup: each cut leaves its files under the checkpoint dir for
    * the application's lifetime (Spark only reaps them with
    * `spark.cleaner.referenceTracking.cleanCheckpoints=true`, a
    * context-start setting). Point [[ConfKey]] at a per-run directory
    * and remove it when the job ends.
    */
  def cut(df: DataFrame, eager: Boolean = true): DataFrame =
    df.sparkSession.conf.getOption(ConfKey) match {
      case Some(dir) if dir.nonEmpty =>
        ensureCheckpointDir(df.sparkSession, dir)
        // a caller-persisted frame keeps ITS cache: persisting again is
        // a no-op and our unpersist would silently evict the caller's
        // entry — only pin/release when we created the pin
        val callerPinned =
          df.storageLevel != org.apache.spark.storage.StorageLevel.NONE
        val pinned = if (callerPinned) df else df.persist()
        try pinned.checkpoint(true)
        finally { if (!callerPinned) { pinned.unpersist(); () } }
      case _ => df.localCheckpoint(eager)
    }
}
