package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over a pair graph — the clustering step that
  * turns verified near-duplicate PAIRS into dedup GROUPS so a pipeline
  * can keep one representative per group (LLM-pipeline extension; the
  * canonical last stage after [[DedupPipeline]]).
  *
  * Plan: iterative min-label propagation. Each node starts labeled with
  * itself; every round each node takes the minimum label among itself
  * and its neighbors (one join + one partial-aggregable groupBy — both
  * distributed); convergence after O(component diameter) rounds, which
  * for near-dup clusters (dense, tiny diameter) is a handful. The
  * driver-side loop carries only the converged/changed COUNT per round,
  * never data — the same shape GraphX's connected components runs
  * under the hood. Labels are minima, so the output is deterministic:
  * `component` is the smallest doc id in the group.
  */
object Clusters {

  /** @param pairs undirected edges, two id columns
    * @return (doc_id, component) for every node appearing in a pair;
    *         component = min node id of its connected component
    */
  def connectedComponents(pairs: DataFrame, a: String = "a_id",
      b: String = "b_id", maxIter: Int = 50): DataFrame = {
    // both directions in ONE pass over `pairs` (explode, not union): the
    // input is typically the tail of an expensive pipeline, and a
    // two-branch union would execute that pipeline once per branch
    val edges = pairs
      .select(explode(array(
        struct(col(a).cast("long").as("x"), col(b).cast("long").as("y")),
        struct(col(b).cast("long").as("x"), col(a).cast("long").as("y")))).as("e"))
      .select(col("e.x").as("x"), col("e.y").as("y"))
      .distinct()
      .persist()
    try {
      // each round goes through localCheckpoint: without lineage
      // truncation the logical plan DOUBLES per iteration (labels feeds
      // both the neighbor-min and the join) and analysis time explodes
      // exponentially even though the data is cached
      var labels = edges.select(col("x").as("node")).distinct()
        .withColumn("label", col("node"))
        .localCheckpoint()
      var converged = edges.isEmpty
      var i = 0
      while (!converged && i < maxIter) {
        // min label over the neighborhood (neighbors ∪ self)
        val nbrMin = edges
          .join(labels.select(col("node").as("y"), col("label").as("ylab")), "y")
          .groupBy(col("x").as("node"))
          .agg(min(col("ylab")).as("nlab"))
        val updated = labels
          .join(nbrMin, Seq("node"), "left")
          .select(col("node"), col("label"),
            least(col("label"), coalesce(col("nlab"), col("label"))).as("nlabel"))
          .localCheckpoint()
        val changed = updated.filter(col("nlabel") < col("label")).count()
        labels = updated.select(col("node"), col("nlabel").as("label"))
        converged = changed == 0
        i += 1
      }
      labels.select(col("node").as("doc_id"), col("label").as("component"))
    } finally edges.unpersist()
  }
}
