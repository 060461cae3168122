package graft.functions

import graft.SparkSpec

class CentralitySpec extends SparkSpec {
  import SparkSpec.spark.implicits._

  private def rank(edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] =
    Centrality.pageRankMicros(edges.toDF("src", "dst"), iters)
      .as[(Long, Long)].collect().toMap

  /** In-memory reference of the exact integer update rule. */
  private def model(edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] = {
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
    val outdeg = edges.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    var r = nodes.map(_ -> 1000000L).toMap
    (0 until iters).foreach { _ =>
      val contrib = edges.groupBy(_._2).view.mapValues(
        _.map { case (u, _) => r(u) / outdeg(u) }.sum).toMap
      r = nodes.map(v =>
        v -> (150000L + 8500L * contrib.getOrElse(v, 0L) / 10000L)).toMap
    }
    r
  }

  test("matches the in-memory integer model on a small digraph") {
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 1L), (4L, 3L))
    (0 to 4).foreach { it =>
      assert(rank(edges, it) == model(edges, it), s"iters=$it")
    }
  }

  test("star center out-ranks the leaves") {
    val edges = (2L to 10L).flatMap(i => Seq((i, 1L), (1L, i)))
    val r = rank(edges, 3)
    val leaves = (2L to 10L).map(r)
    assert(leaves.forall(_ < r(1L)))
    assert(leaves.distinct.size == 1) // symmetric leaves tie exactly
  }

  test("ranks are partitioning-invariant exact integers") {
    val edges = (1L to 60L).map(i => (i, i * 7 % 60 + 1))
    val a = rank(edges, 3)
    val b = Centrality.pageRankMicros(
        edges.toDF("src", "dst").repartition(17), 3)
      .as[(Long, Long)].collect().toMap
    assert(a == b)
  }

  test("dangling mass leaks but ranking survives (documented contract)") {
    // 1 -> 2 -> 3, node 3 dangling: totals shrink, order is 3 > 2 ~ base
    val r = rank(Seq((1L, 2L), (2L, 3L)), 3)
    assert(r(3L) > r(2L) && r(2L) >= r(1L))
  }

  /** In-memory reference of the redistribute-to-all integer rule. */
  private def modelDangling(edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] = {
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
    val outdeg = edges.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    var r = nodes.map(_ -> 1000000L).toMap
    (0 until iters).foreach { _ =>
      val contrib = edges.groupBy(_._2).view.mapValues(
        _.map { case (u, _) => r(u) / outdeg(u) }.sum).toMap
      val share = nodes.filterNot(outdeg.contains).map(r).sum / nodes.size
      r = nodes.map(v =>
        v -> (150000L + 8500L * (contrib.getOrElse(v, 0L) + share) / 10000L)).toMap
    }
    r
  }

  private def rankDangling(edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] =
    Centrality.pageRankMicros(edges.toDF("src", "dst"), iters,
        redistributeDangling = true)
      .as[(Long, Long)].collect().toMap

  test("redistribute-to-all dangling variant matches its integer model") {
    val edges = Seq((1L, 2L), (2L, 3L), (4L, 3L), (3L, 5L)) // 5 dangling
    (0 to 4).foreach { it =>
      assert(rankDangling(edges, it) == modelDangling(edges, it), s"iters=$it")
    }
    // chain with a dangling tail: redistribution props totals up vs leak
    val chain = Seq((1L, 2L), (2L, 3L))
    val leaky = rank(chain, 3)
    val full = rankDangling(chain, 3)
    assert(full.values.sum > leaky.values.sum)
  }

  test("dangling variant on an empty edge set returns empty, no 0/0") {
    val empty = Seq.empty[(Long, Long)].toDF("src", "dst")
    assert(Centrality.pageRankMicros(empty, 2, redistributeDangling = true)
      .collect().isEmpty)
  }

  test("dangling variant stays partitioning-invariant") {
    val edges = (1L to 40L).map(i => (i, i * 11 % 45 + 1)) // some dangling dsts
    val a = rankDangling(edges, 3)
    val b = Centrality.pageRankMicros(
        edges.toDF("src", "dst").repartition(13), 3,
        redistributeDangling = true)
      .as[(Long, Long)].collect().toMap
    assert(a == b)
  }
}
