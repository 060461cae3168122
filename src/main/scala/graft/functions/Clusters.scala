package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.core.Lineage

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
  *
  * Choosing an algorithm: [[connectedComponents]] (min-label
  * propagation) does O(diameter) rounds — optimal for near-dup
  * clusters, whose diameter is a small constant. For graphs whose
  * diameter is unknown or large (entity-resolution chains, link
  * graphs), [[connectedComponentsAltStar]] converges in O(log n)
  * rounds of the alternating large-star/small-star contraction
  * instead.
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
      // each round goes through a lineage cut (Lineage.cut — reliable
      // checkpoint on a cluster, localCheckpoint otherwise): without
      // truncation the logical plan DOUBLES per iteration (labels feeds
      // both the neighbor-min and the join) and analysis time explodes
      // exponentially even though the data is cached
      var labels = Lineage.cut(edges.select(col("x").as("node")).distinct()
        .withColumn("label", col("node")))
      var converged = edges.isEmpty
      var i = 0
      while (!converged && i < maxIter) {
        // min label over the neighborhood (neighbors ∪ self)
        val nbrMin = edges
          .join(labels.select(col("node").as("y"), col("label").as("ylab")), "y")
          .groupBy(col("x").as("node"))
          .agg(min(col("ylab")).as("nlab"))
        // lazy checkpoint: the `changed` count is the materializing action,
        // so each round runs ONE job (compute + checkpoint + count) instead
        // of two — at tiny post-verification graph sizes the loop cost is
        // per-job scheduling latency, not data
        val updated = Lineage.cut(labels
          .join(nbrMin, Seq("node"), "left")
          .select(col("node"), col("label"),
            least(col("label"), coalesce(col("nlab"), col("label"))).as("nlabel")),
          eager = false)
        val changed = updated.filter(col("nlabel") < col("label")).count()
        labels = updated.select(col("node"), col("nlabel").as("label"))
        converged = changed == 0
        i += 1
        // observable fixpoint progress: lets callers (and specs) assert
        // the expensive loop does NOT re-run on a later plan re-read
        graft.core.Metrics.inc("graft.cc.rounds")
      }
      // a silent partial answer would look exactly like a real one —
      // refuse instead (raise maxIter, or use the O(log n)-round
      // connectedComponentsAltStar for high-diameter graphs)
      if (!converged) throw new IllegalStateException(
        s"connectedComponents did not converge in $maxIter rounds " +
          "(component diameter exceeds maxIter); raise maxIter or use " +
          "connectedComponentsAltStar")
      labels.select(col("node").as("doc_id"), col("label").as("component"))
    } finally edges.unpersist()
  }

  /** Connected components by alternating large-star/small-star
    * contraction — O(log n) rounds regardless of component diameter
    * (the MapReduce CC algorithm of Kiveris et al., "Connected
    * Components in MapReduce and Beyond"). Each round is two
    * groupBy-and-emit passes over the edge list:
    *
    *  - large-star at node u links every neighbor LARGER than u to the
    *    minimum of u's closed neighborhood — long tails fold onto small
    *    ids in one hop;
    *  - small-star at node u (edges directed large→small) re-links u
    *    and its smaller neighbors to their minimum — stars flatten.
    *
    * A fixpoint is a forest of stars centered at each component's
    * minimum id. Same contract and output as [[connectedComponents]]
    * (nodes of self-pairs excepted: a (x, x) input pair contributes no
    * edge here).
    */
  def connectedComponentsAltStar(pairs: DataFrame, a: String = "a_id",
      b: String = "b_id", maxIter: Int = 50): DataFrame = {
    // canonical large→small edges, one pass over the input (see
    // connectedComponents on why not union), self-loops dropped
    var edges = Lineage.cut(pairs
      .select(col(a).cast("long").as("p"), col(b).cast("long").as("q"))
      .filter(col("p") =!= col("q"))
      .select(greatest(col("p"), col("q")).as("u"),
        least(col("p"), col("q")).as("v"))
      .distinct())
    val nodes = Lineage.cut(edges.select(col("u").as("node"))
      .union(edges.select(col("v").as("node"))).distinct())

    // a star emission at node u needs only the MINIMUM of u's
    // neighborhood, never the member list: a partial-aggregable min()
    // joined back to the edges keeps a hub node (a component-min at
    // the fixpoint holds its whole component as neighbors) spread
    // across tasks instead of materialized as one collect_list row
    def emitStars(e: DataFrame, large: Boolean): DataFrame = {
      val mins = e.groupBy(col("u"))
        .agg(min(col("v")).as("nmin"))
        .select(col("u"), least(col("u"), col("nmin")).as("m"))
      val relinked =
        if (large)
          // large-star: every neighbor LARGER than u links to the
          // closed-neighborhood min
          e.join(mins, "u").filter(col("v") > col("u"))
            .select(col("v").as("p"), col("m").as("q"))
        else
          // small-star (edges directed large→small, so v < u always):
          // smaller neighbors and u itself re-link to the min
          e.join(mins, "u").filter(col("v") =!= col("m"))
            .select(col("v").as("p"), col("m").as("q"))
            .union(mins.select(col("u").as("p"), col("m").as("q")))
      relinked
        .filter(col("p") =!= col("q"))
        .select(greatest(col("p"), col("q")).as("u"),
          least(col("p"), col("q")).as("v"))
        .distinct()
    }

    def fingerprint(e: DataFrame): (Long, java.math.BigDecimal) = {
      // decimal sum: ANSI mode would throw on long overflow of a plain
      // sum of 64-bit hashes
      val r = e.agg(count(lit(1)),
        coalesce(sum(xxhash64(col("u"), col("v")).cast("decimal(38,0)")),
          lit(0).cast("decimal(38,0)"))).first()
      (r.getLong(0), r.getDecimal(1))
    }

    var fp = fingerprint(edges)
    var converged = fp._1 == 0
    var i = 0
    while (!converged && i < maxIter) {
      // large-star needs BOTH directions of every edge (its star is over
      // the full neighborhood); small-star consumes the directed form
      val bidirected = edges.select(explode(array(
        struct(col("u"), col("v")),
        struct(col("v").as("u"), col("u").as("v")))).as("e"))
        .select(col("e.u").as("u"), col("e.v").as("v"))
      // lazy checkpoints: the fingerprint aggregation materializes both
      // (one job per round); lineage is still truncated for round i+1
      val afterLarge = Lineage.cut(emitStars(bidirected, large = true),
        eager = false)
      val afterSmall = Lineage.cut(emitStars(afterLarge, large = false),
        eager = false)
      val nfp = fingerprint(afterSmall)
      converged = nfp == fp
      fp = nfp
      edges = afterSmall
      i += 1
    }
    if (!converged) throw new IllegalStateException(
      s"connectedComponentsAltStar did not converge in $maxIter rounds")
    // fixpoint: every edge is (member, component-min)
    nodes.join(edges.select(col("u").as("node"), col("v").as("component")),
        Seq("node"), "left")
      .select(col("node").as("doc_id"),
        coalesce(col("component"), col("node")).as("component"))
  }
}
