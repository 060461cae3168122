package graft.tools

import graft.{SparkEntry, SparkSpec}

/** Partition-layout invariance: a query's RESULT must not depend on
  * `spark.sql.shuffle.partitions` or on AQE's runtime coalescing. On a
  * real cluster the shuffle width is a deployment knob (thousands of
  * partitions at 100 TB, a handful in local tests), so any
  * layout-dependence — a top-k tie broken by partition order, a sample
  * derived from partition ids, an aggregation whose merge order leaks
  * into the output — produces results that silently change with cluster
  * size while passing every fixed-width local run.
  *
  * The slice picks the queries whose SHAPES are most exposed to layout:
  * ordered top-k (tie-breaks), distinct, joins (incl. the salted-skew
  * rewrite), every sampling scheme (must be hash-derived, never
  * partition-derived), sketches (merge-order sensitivity), quantiles,
  * clustering fixpoints, and session windows. Each runs once at the
  * suite default width (4, AQE on) and once at a deliberately co-prime
  * width (13, AQE off) — bit-identical canonical rows required.
  */
class PartitionInvarianceSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  private val slice = Seq(
    "q_sorted_topk", "q_group_reduce_top2", "q_distinct",
    "q_join", "q_left_join", "q_salted_join",
    "q_reservoir_sample", "q_weighted_sample", "q_stratified_sample",
    "q_train_split", "q_heavy_hitters", "q_kmv_distinct",
    "q_ann_topk", "q_bm25_topk", "q_gap_quantiles",
    "q_window_session", "q_dedup_clusters", "q_rrf_fusion")

  test("results are bit-identical across shuffle widths (4/AQE-on vs 13/AQE-off)") {
    val prevParts = spark.conf.get("spark.sql.shuffle.partitions")
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    val diverged = scala.collection.mutable.ArrayBuffer.empty[String]
    try {
      slice.foreach { name =>
        spark.conf.set("spark.sql.shuffle.partitions", prevParts)
        spark.conf.set("spark.sql.adaptive.enabled", "true")
        val base = LocalClusterSmoke.canon(SparkEntry.queries(name)(spark, sfDir))
        assert(base.nonEmpty, s"$name: empty result proves nothing")
        spark.conf.set("spark.sql.shuffle.partitions", "13")
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        val wide = LocalClusterSmoke.canon(SparkEntry.queries(name)(spark, sfDir))
        if (wide != base) {
          val firstDiff = wide.zipAll(base, "<missing>", "<missing>")
            .find(p => p._1 != p._2)
            .map(p => s"wide=${p._1.take(120)} base=${p._2.take(120)}")
            .getOrElse("<sizes differ>")
          diverged += s"$name: base=${base.size} wide=${wide.size} rows; $firstDiff"
        }
      }
      assert(diverged.isEmpty,
        s"partition-layout-dependent results:\n${diverged.mkString("\n")}")
    } finally {
      spark.conf.set("spark.sql.shuffle.partitions", prevParts)
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
    }
  }
}
