package graft.queries

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.execution.SparkPlan

import graft.{SparkEntry, SparkSpec}

/** Golden physical-plan SKELETONS for the expensive query surface.
  *
  * Wall-clock at sf0.1 is host-noise-bound (r14 adjudicated ±10-24%
  * session bands by hand); the PLAN is the stable signal. This spec pins
  * the executed-plan skeleton — operator tree, exchange/broadcast/
  * TakeOrdered markers, join strategies + build sides, scan column
  * widths, codegen span boundaries; no IDs, paths, or partition counts —
  * for the most expensive batch rows. A regression that de-broadcasts a
  * dimension join, drops a TakeOrdered into a global sort, or knocks a
  * hot operator out of whole-stage codegen fails HERE, loudly, at test
  * time, instead of surfacing as an ambiguous bench mover a round later.
  *
  * Capture regime: AQE OFF on a cloned session (the skeleton pins the
  * STATIC plan the optimizer commits to; AQE's runtime rewrites are
  * workload-dependent by design) and the bench shuffle width, against
  * the sf0.001 fixture (join-strategy thresholds see the same file
  * sizes everywhere the suite runs).
  *
  * INTENTIONAL plan changes: re-run with GRAFT_PLANS_REGEN=1 in the
  * environment (`GRAFT_PLANS_REGEN=1 sbt "testOnly *PlanStabilitySpec"`)
  * to rewrite the goldens under src/test/resources/goldens/plans/, then
  * review the diff and note the reason in the round's BENCH_NOTES.
  */
class PlanStabilitySpec extends SparkSpec {

  private val SfDir = "/root/testdata/sf0.001"

  private val GoldenDir =
    Paths.get(sys.props("user.dir"), "src", "test", "resources",
      "goldens", "plans")

  /** The pinned rows: the bench-expensive batch-analytic surface (the
    * sf1 top movers + every capped pair generator + the join/topk/agg
    * shapes the 100 TB story leans on). Streaming-backed rows are out —
    * their returned frame is a sink read, not the interesting plan.
    */
  private val Pinned: Seq[String] = Seq(
    "q1_agg", "q_join", "q_join_dims", "q_left_join", "q_filter",
    "q_sorted_topk", "q_group_reduce_top2",
    "q_ann_topk", "q_ann_join", "q_ivf_topk",
    "q_minhash_sig", "q_lsh_candidates", "q_jaccard_pairs",
    "q_containment_pairs", "q_dedup_exact", "q_dedup_pipeline",
    "q_simhash_near_dup", "q_substring_pairs", "q_exact_substring_dedup",
    "q_segment_dedup", "q_winnow_select",
    "q_bm25_topk", "q_tfidf", "q_rrf_fusion",
    "q_url_dedup", "q_token_budget", "q_salted_join",
    "q_retention_cohorts", "q_secondary_index", "q_snapshot_diff")

  /** Rendering lives in [[graft.plans.PlanSkeleton]] — shared with the
    * streaming goldens so the two specs cannot drift on what counts as
    * signal vs noise.
    */
  private def skeleton(p: SparkPlan): String =
    graft.plans.PlanSkeleton.skeleton(p)

  /** Rows whose SparkEntry form returns a checkpoint of a scratch store
    * (the interesting plan dies with the temp dir): capture the
    * operator's own frame instead. q_ann_join pins the salted-cell
    * distributed ANN join — THE "never a cartesian" plan.
    */
  private val Overrides: Map[String, org.apache.spark.sql.SparkSession =>
      org.apache.spark.sql.DataFrame] = Map(
    "q_ann_join" -> { s =>
      val emb = graft.sources.Tables.embeddings(s, SfDir)
      val centroids = graft.functions.Ivf.train(emb, nCentroids = 8,
        maxIter = 5)
      val tmp = Files.createTempDirectory("graft-planstab-ann-").toString
      val store = new graft.functions.IvfStore(s, tmp + "/v", centroids)
      store.write(emb)
      store.searchTopKJoin(
        emb.filter(org.apache.spark.sql.functions.col("vec_id") < 500),
        5, nProbe = 8)
    })

  /** Rows ALSO pinned with auto-broadcast disabled — the at-scale plan:
    * at 100 TB the store side of the ANN join never fits a broadcast,
    * so the golden that matters is the salted SHUFFLE join (and it must
    * still never degrade to a nested-loop/cartesian). The sf0.001
    * fixture otherwise hides that shape behind a size-based broadcast.
    */
  private val NoBroadcastVariants: Set[String] = Set("q_ann_join")

  private def capture(name: String, noBroadcast: Boolean = false): String = {
    // a fresh clone per row: AQE off for a static skeleton, bench width
    // so the captured layout is the one Bench runs
    val s = org.apache.spark.sql.GraftSqlBridge.cloneSession(spark)
    s.conf.set("spark.sql.adaptive.enabled", "false")
    s.conf.set("spark.sql.shuffle.partitions", "32")
    if (noBroadcast) s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val df = Overrides.getOrElse(name,
      (ss: org.apache.spark.sql.SparkSession) =>
        SparkEntry.queries(name)(ss, SfDir))(s)
    skeleton(df.queryExecution.executedPlan)
  }

  private val regen = sys.env.contains("GRAFT_PLANS_REGEN")

  NoBroadcastVariants.foreach { name =>
    test(s"plan skeleton (at-scale, no broadcast): $name") {
      val actual = capture(name, noBroadcast = true)
      // the at-scale shape must be a real partitioned join — a silent
      // fallback to nested-loop/cartesian here is the 100 TB disaster
      assert(!actual.contains("CartesianProduct") &&
        !actual.contains("BroadcastNestedLoopJoin"), actual)
      val golden = GoldenDir.resolve(s"${name}__nobroadcast.plan")
      if (regen) {
        Files.createDirectories(GoldenDir)
        Files.write(golden, actual.getBytes("UTF-8"))
        info(s"regenerated ${golden.getFileName}")
      } else {
        assert(Files.exists(golden),
          s"no golden for $name (no-broadcast) — run GRAFT_PLANS_REGEN=1")
        val expected = new String(Files.readAllBytes(golden), "UTF-8")
        assert(actual == expected,
          s"at-scale skeleton of $name changed.\n---- golden ----\n" +
            s"$expected\n---- actual ----\n$actual")
      }
    }
  }

  Pinned.foreach { name =>
    test(s"plan skeleton: $name") {
      val actual = capture(name)
      val golden = GoldenDir.resolve(s"$name.plan")
      if (regen) {
        Files.createDirectories(GoldenDir)
        Files.write(golden, actual.getBytes("UTF-8"))
        info(s"regenerated ${golden.getFileName}")
      } else {
        assert(Files.exists(golden),
          s"no golden for $name — run GRAFT_PLANS_REGEN=1 sbt " +
            "'testOnly *PlanStabilitySpec' and commit the new file")
        val expected = new String(Files.readAllBytes(golden), "UTF-8")
        assert(actual == expected,
          s"""|executed-plan skeleton of $name changed.
              |If INTENTIONAL: GRAFT_PLANS_REGEN=1 sbt 'testOnly *PlanStabilitySpec',
              |review the golden diff, note the reason in BENCH_NOTES.
              |---- golden ----
              |$expected
              |---- actual ----
              |$actual""".stripMargin)
      }
    }
  }
}
