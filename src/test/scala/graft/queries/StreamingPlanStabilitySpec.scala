package graft.queries

import java.nio.file.{Files, Paths}

import graft.{SparkEntry, SparkSpec}

/** Golden SHAPE skeletons for the streaming query surface — the
  * streaming counterpart of PlanStabilitySpec's batch plan goldens.
  *
  * Wall-clock on the streaming rows is micro-batch-count-dominated and
  * host-noise-bound; the stable regression signal is the SHAPE of the
  * run: how many data micro-batches the replay admitted, how many
  * stateful operators the query planned (an accidental extra
  * deduplicate/aggregate is invisible to every row-level oracle), each
  * operator's name and final state-row count, and the executed plan
  * skeleton of the last micro-batch (streaming runs AQE-off by design,
  * so the static skeleton IS the executed one). A regression that adds
  * a stateful operator, knocks the state math off its keys (state rows
  * jump), or silently re-batches the replay fails HERE at test time
  * instead of surfacing as an ambiguous bench mover a round later.
  *
  * Capture rides [[StreamSupport.probe]]: the memory-sink harness hands
  * over each driven query BEFORE stopping it, while recentProgress and
  * lastExecution are still attached. Rows whose streaming query runs
  * through foreachBatch writers (the store *_stream maintenance rows)
  * plan their real work as BATCH queries inside the lambda — those are
  * covered by the batch goldens of their operators, not here.
  *
  * INTENTIONAL shape changes: re-run with GRAFT_PLANS_REGEN=1 to
  * rewrite the goldens under src/test/resources/goldens/streams/, then
  * review the diff and note the reason in the round's BENCH_NOTES.
  */
class StreamingPlanStabilitySpec extends SparkSpec {

  private val SfDir = "/root/testdata/sf0.001"

  private val GoldenDir =
    Paths.get(sys.props("user.dir"), "src", "test", "resources",
      "goldens", "streams")

  /** Every memory-sink-driven streaming oracle row: the stateful
    * operator suite (state machines, windows, dedup) plus the bare
    * source-replay rows (their shape pins batch admission — the
    * throttled one-file-per-trigger contract).
    */
  private val Pinned: Seq[String] = Seq(
    "q_reduce_value_state_early", "q_reduce_value_state_stream",
    "q_integrate_per_key_stream", "q_snapshot_updates_stream",
    "q_late_drop", "q_window_early_emit_stream", "q_unbounded_count",
    "q_dedup_stream", "q_url_dedup_stream",
    "q_stream_from_oldest", "q_stream_from_stamp")

  /** Normalized shape of one driven streaming query: progress summary +
    * last micro-batch plan skeleton. Deterministic fields only — no
    * durations, no memory bytes, no watermark wall values.
    */
  private def shapeOf(q: org.apache.spark.sql.streaming.StreamingQuery): String = {
    val sb = new StringBuilder
    val progress = q.recentProgress
    sb.append(s"dataBatches=${progress.count(_.numInputRows > 0)}\n")
    progress.lastOption.foreach { p =>
      sb.append(s"statefulOperators=${p.stateOperators.length}\n")
      p.stateOperators.foreach { so =>
        sb.append(s"state ${so.operatorName} rowsTotal=${so.numRowsTotal}\n")
      }
    }
    val exec = q.asInstanceOf[
        org.apache.spark.sql.execution.streaming.runtime.StreamingQueryWrapper]
      .streamingQuery.lastExecution
    sb.append("-- last micro-batch executed plan --\n")
    sb.append(graft.plans.PlanSkeleton.skeleton(exec.executedPlan))
    sb.toString
  }

  /** Run the oracle row and capture every streaming query it drives
    * (some rows replay several logs; each gets its own section).
    */
  private def capture(name: String): String = {
    val sections = new java.lang.StringBuilder
    StreamSupport.probe = Some { q =>
      sections.synchronized {
        if (sections.length > 0) sections.append("==== next query ====\n")
        sections.append(shapeOf(q))
      }
    }
    try SparkEntry.queries(name)(spark, SfDir).collect()
    finally StreamSupport.probe = None
    val out = sections.toString
    assert(out.nonEmpty,
      s"$name drove no memory-sink streaming query — pin it in the batch " +
        "goldens instead")
    out
  }

  private val regen = sys.env.contains("GRAFT_PLANS_REGEN")

  Pinned.foreach { name =>
    test(s"streaming shape skeleton: $name") {
      val actual = capture(name)
      val golden = GoldenDir.resolve(s"$name.shape")
      if (regen) {
        Files.createDirectories(GoldenDir)
        Files.write(golden, actual.getBytes("UTF-8"))
        info(s"regenerated ${golden.getFileName}")
      } else {
        assert(Files.exists(golden),
          s"no golden for $name — run GRAFT_PLANS_REGEN=1 sbt " +
            "'testOnly *StreamingPlanStabilitySpec' and commit the new file")
        val expected = new String(Files.readAllBytes(golden), "UTF-8")
        assert(actual == expected,
          s"""|streaming shape of $name changed.
              |If INTENTIONAL: GRAFT_PLANS_REGEN=1 sbt 'testOnly *StreamingPlanStabilitySpec',
              |review the golden diff, note the reason in BENCH_NOTES.
              |---- golden ----
              |$expected
              |---- actual ----
              |$actual""".stripMargin)
      }
    }
  }
}
