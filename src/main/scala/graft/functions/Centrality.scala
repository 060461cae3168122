package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Graph centrality for corpus curation — the link-graph quality signal
  * web-scale pipelines use (Common Crawl ranks hosts by centrality to
  * pick crawl/keep candidates): PageRank-style power iteration over an
  * edge table, in EXACT integer micro-units so the result is
  * bit-identical across engines, partitionings and retries (the same
  * cross-engine contract as [[NGramLm]]/[[Dsir]] — no floating
  * accumulation anywhere).
  *
  * Update rule per iteration (dampBp in basis points, ranks in micro-
  * units, all `div` truncating integer division):
  *
  *   contrib(v) = Σ_{u→v} r(u) div outdeg(u)
  *   r'(v)      = (10000−dampBp)·1e6 div 10000  +  dampBp·contrib(v) div 10000
  *
  * Scale shape: one outdegree aggregate up front; each iteration is one
  * edges⋈ranks join (edges pre-partitioned by src once, persisted) plus
  * one partial-aggregable groupBy(dst), with a lineage cut per round
  * ([[graft.core.Lineage.cut]] — reliable checkpoint on a cluster,
  * localCheckpoint otherwise) — the classic O(iters) join-agg plan, no
  * driver-side graph. By default dangling mass leaks (classic
  * simplification — ranking order, not stochastic normalization, is the
  * product here); `redistributeDangling = true` adds the stochastic
  * completion: each round, the summed rank of out-degree-0 nodes is
  * split equally over ALL nodes (`div` truncating, the sub-micro
  * remainder still leaks — exactness over conservation) before damping.
  * One extra 1-row aggregate per round, same integer determinism.
  */
object Centrality {

  val ScaleMicros = 1000000L

  /** (id, rank_micros) after `iters` rounds over `edges(src, dst)`. */
  def pageRankMicros(edges: DataFrame, iters: Int,
      dampBp: Long = 8500L,
      redistributeDangling: Boolean = false): DataFrame = {
    require(iters >= 0 && dampBp >= 0 && dampBp <= 10000)
    val e = edges.select(col("src"), col("dst"))
      .repartition(col("src")).persist()
    val nodes = e.select(col("src").as("id"))
      .unionByName(e.select(col("dst").as("id")))
      .distinct().persist()
    val outdeg = e.groupBy(col("src")).agg(count(lit(1)).as("d"))
    val base = (10000L - dampBp) * ScaleMicros / 10000L
    val nNodes = if (redistributeDangling) nodes.count() else 0L

    var ranks = nodes.withColumn("r", lit(ScaleMicros))
    (0 until iters).foreach { _ =>
      val contrib = e
        .join(outdeg, "src")
        .join(ranks.withColumnRenamed("id", "src"), "src")
        .select(col("dst"), expr("r div d").as("c"))
        .groupBy(col("dst")).agg(sum(col("c")).as("c"))
      // dangling completion: one tiny anti-join aggregate (rank mass of
      // nodes with no out-edges), its per-node share folded into every
      // node's contribution before damping. The 1-row collect per round
      // is the same bounded driver traffic class as the loop's lineage
      // cut — never data-sized.
      val share =
        if (!redistributeDangling || nNodes == 0) 0L // empty graph: no mass
        else {
          val dSum = ranks
            .join(outdeg.withColumnRenamed("src", "id"), Seq("id"), "left_anti")
            .agg(coalesce(sum(col("r")), lit(0L))).first().getLong(0)
          dSum / nNodes
        }
      // LAZY cut: the logical plan is truncated immediately (analysis
      // stays O(1) per round), but materialization is deferred — the
      // dangling variant's per-round dSum aggregate doubles as the
      // materializing action, and the plain variant runs the WHOLE loop
      // as one pipelined action below instead of one barrier per round
      ranks = graft.core.Lineage.cut(nodes
        .join(contrib.withColumnRenamed("dst", "id"), Seq("id"), "left")
        .select(col("id"),
          (lit(base) + expr(
            s"$dampBp * (coalesce(c, CAST(0 AS BIGINT)) + $share) div 10000"))
            .as("r")), eager = false)
    }
    val out = ranks.select(col("id"), col("r").as("rank_micros"))
    // materialize the pending lazy checkpoints while e/nodes are still
    // pinned — the returned frame must stand on its own storage
    if (iters > 0) ranks.count()
    e.unpersist()
    nodes.unpersist()
    out
  }
}
