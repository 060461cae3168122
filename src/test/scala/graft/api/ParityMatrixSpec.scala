package graft.api

import graft.SparkSpec

/** 1:1 parity matrix against the reference's abstract operator-semantics
  * suite (reference: tools/src/test/java/cz/o2/proxima/tools/groovy/
  * GroovyEnvTest.java — 38 tests, lines cited per row). Every reference
  * test maps to either (a) an engine test/oracle that pins the same
  * semantics, or (b) a runnable composite implemented IN THIS SUITE with
  * the reference's exact fixture, or (c) a documented N/A with the reason.
  *
  * The matrix is data — `coverage` below — and a self-check test asserts
  * it stays total (all 38 names, no blanks). The composite scenarios
  * (chained stateful ops, union across different windowings, lateness +
  * sliding composition, UDF error propagation, calendar units) run for
  * real against the engine's lowerings.
  */
class ParityMatrixSpec extends SparkSpec {
  import SparkSpec.spark.implicits._

  private def stream[T: org.apache.spark.sql.Encoder](xs: T*): GStream[T] =
    GStream.fromSeq(spark, xs)

  // ---------------------------------------------------------------------
  // The matrix: reference test name -> (ref line, engine coverage).
  // "HERE:<test>" = implemented in this suite with the reference fixture.
  // "N/A:<reason>" = documented platform divergence.
  // ---------------------------------------------------------------------
  private val coverage: Seq[(String, Int, String)] = Seq(
    ("testStreamFromOldestCollect", 63,
      "q_stream_from_oldest oracle; streaming/StreamingSpec"),
    ("testUnionFromOldestCollect", 80,
      "q_union oracle (union of sources) + q_stream_from_oldest; " +
        "GStreamSpec union semantics"),
    ("testBatchUpdatesCollect", 97, "q_batch_updates_range oracle"),
    ("testBatchUpdatesCollectWildcard", 108,
      "q_scan_wildcard / q_batch_updates_range oracles over wildcard attrs"),
    ("testBatchUpdatesCollectWildcardMultiple", 125,
      "N/A by construction: Spark Datasets are re-executable declarative " +
        "plans — a second collect() re-runs the scan; there is no " +
        "consume-once source state to pin (the reference guards a Groovy " +
        "shell iterator-reuse bug)"),
    ("testUnionBatchUpdatesCollect", 145, "q_union oracle"),
    ("testStreamFromOldestWindowedCollect", 166,
      "q_stream_from_oldest + q_reduce_to_latest oracles"),
    ("testStreamPersist", 184,
      "q_idempotent_sink oracle; GStream.persist -> CommitLogFamily"),
    ("testStreamPersistWithDeletes", 201,
      "SnapshotLaws property suite (tombstones survive reduceToLatest); " +
        "q_snapshot_wildcard_delete oracle"),
    ("testPersistIntoTargetFamily", 217, "q_transformation_backfill oracle"),
    ("testPersistIntoTargetFamilyBulk", 234,
      "q_transformation_backfill + q_blob_updates_range (bulk blob family)"),
    ("testClosureByteCodeAvailability", 257,
      "N/A: Groovy-shell closure BYTECODE shipping is the Groovy class " +
        "loader's concern; Spark ships closures via closure serialization " +
        "(platform). The engine's user-code seam is pinned by " +
        "q_shell_closure (tools/ShellExpr)"),
    ("testGrabJarAvailability", 270,
      "N/A: @Grab dynamic jar resolution is Groovy tooling; the Spark " +
        "analog (spark.jars / addJar) is platform, not engine, surface"),
    ("testWildcardDelete", 286,
      "q_snapshot_wildcard_delete + q_reduce_to_latest oracles — NOTE the " +
        "reference @Ignores this (issue #110, reduceToLatest ignores " +
        "wildcard deletes); this engine implements it (SnapshotLaws)"),
    ("testWildcardDeleteRandomRead", 316,
      "q_list_entities + q_scan_wildcard oracles (key-scoped list)"),
    ("testWildcardPrefixRead", 346,
      "q_scan_wildcard oracle (prefix-scoped scan); " +
        "randomaccess/RandomAccessReaderSpec"),
    ("testMap", 373, "GStreamSpec 'map/filter/flatMap/union'; q_map_project"),
    ("testFlatMap", 388, "GStreamSpec; q_flatmap_tokens oracle"),
    ("testPrintln", 402, "HERE:print does not throw"),
    ("testGroupReduce", 413, "GStreamSpec groupReduce; q_group_reduce_top2"),
    ("testJoin", 457, "GStreamSpec 'windowed inner join'; q_join oracle"),
    ("testLeftOuterJoin", 506, "GStreamSpec 'windowed left join'; q_left_join"),
    ("testGroupReduceConsumed", 553, "HERE:groupReduce output survives downstream filter"),
    ("testIntegratePerKey", 598,
      "GStreamSpec 'integratePerKey running sums'; q_integrate_per_key"),
    ("testReduceValueStateByKey", 645,
      "GStreamSpec 'reduceValueStateByKey emits output(state,v)'; " +
        "q_reduce_value_state oracle"),
    ("testReduceValueStateByKeyUnsorted", 697,
      "GStreamSpec unsorted fold; q_reduce_value_state_unsorted oracle"),
    ("testReduceValueWithIntegratePerKey", 749,
      "HERE:chained stateful ops (reduceValueStateByKey -> integratePerKey); " +
        "q_integrate_after_reduce_state oracle"),
    ("testReduceValueStateByKeyWithSameStamp", 830,
      "HERE:same-stamp state threading (tie ORDER is engine-unspecified — " +
        "distributed sort does not pin arrival order; the invariant pinned " +
        "is sequential threading through every same-stamp element)"),
    ("testReduceValueStateWithLatenessAndSlidingWindow", 910,
      "HERE:lateness + reduceValueState + sliding window composition"),
    ("testUnionOnDifferentWindows", 965,
      "HERE:union of differently-windowed aggregates; q_window_union oracle"),
    ("testUnionOnDifferentWindowsDifferentTrigger", 994,
      "HERE:union of two global-window aggregates"),
    ("testIntegratePerKeyAfterWindowing", 1017,
      "HERE:integratePerKey over windowed counts"),
    ("testSumDistinctSlidingWindow", 1048,
      "HERE:distinct counts per sliding window (reference fixture); " +
        "GStreamSpec has the arithmetic variant"),
    ("testUdfErrorFailIsPropagated", 1099,
      "HERE:user exception propagates out of collect()"),
    ("testCalendarWindowDays", 1114, "HERE:calendar windows, reference fixture"),
    ("testCalendarWindowWeeks", 1119, "HERE:calendar windows, reference fixture"),
    ("testCalendarWindowMonths", 1124, "HERE:calendar windows, reference fixture"),
    ("testCalendarWindowYears", 1129, "HERE:calendar windows, reference fixture")
  )

  test("matrix is total: all 38 reference tests mapped, no blanks") {
    assert(coverage.size == 38, s"expected 38 rows, got ${coverage.size}")
    assert(coverage.map(_._1).distinct.size == 38, "duplicate test names")
    assert(coverage.forall(_._3.nonEmpty), "blank coverage entry")
    // lines must be strictly increasing — they mirror the reference file
    assert(coverage.map(_._2) == coverage.map(_._2).sorted)
    // when the reference checkout is present, cross-check name-for-name
    val ref = new java.io.File(
      "/root/reference/tools/src/test/java/cz/o2/proxima/tools/groovy/GroovyEnvTest.java")
    if (ref.isFile) {
      val src = new String(java.nio.file.Files.readAllBytes(ref.toPath), "UTF-8")
      val names = "public void (test\\w+)\\(".r.findAllMatchIn(src).map(_.group(1)).toSeq
      assert(names.sorted == coverage.map(_._1).sorted,
        s"matrix drifted from reference: missing=${names.diff(coverage.map(_._1))} " +
          s"extra=${coverage.map(_._1).diff(names)}")
      info(s"${names.size}/38 mapped, reference checkout verified " +
        "(name-for-name against GroovyEnvTest.java)")
    } else info("38 rows mapped; reference checkout absent, " +
      "name-for-name cross-check skipped")
  }

  // ---------------------------------------------------------------------
  // Composite scenarios implemented with the reference's exact fixtures.
  // ---------------------------------------------------------------------

  test("testReduceValueWithIntegratePerKey:749 — chained stateful ops " +
      "with timestamp propagation") {
    // reference fixture: (key, extracted value, stamp) for five writes
    val s = stream(
      ("key1", 1, 1000L), ("key1", 0, 1001L), ("key2", 1, 1002L),
      ("key1", 1, 1003L), ("key1", 1, 1004L)).assignEventTime(_._3)
    // per-key "changes only": output v - prevValue, state = v
    val reduced = s.reduceValueStateByKeyTimed[String, Int, Int, Int](
      _._1, _._2, 0, (st, v) => v - st, (_, v) => v)
    // then a GLOBAL running aggregate over the diffs, event-time order
    val integrated = reduced.integratePerKeyTimed[String, Int](
      _ => "", _._2, 0, _ + _)
    val result = integrated.collect().sortBy(_._3).map(_._2)
    assert(result == Seq(1, 0, 1, 2, 2), result.toString)
    // withTimestamp on the chained result still works (stamp propagated)
    val stamped = integrated.withTimestamp.collect().map(_._2).sorted
    assert(stamped == Seq(1000L, 1001L, 1002L, 1003L, 1004L))
  }

  test("testReduceValueStateByKeyWithSameStamp:830 — state threads " +
      "sequentially through same-stamp elements") {
    // reference fixture: each write flatMaps to TWO values (v+1, v+2) at
    // the SAME stamp; values per (key, stamp): key1@1000 -> {2,3},
    // key1@1001 -> {1,2}, key2@1002 -> {2,3}, key1@1003 -> {2,3},
    // key1@1004 -> {2,3}
    val base = Seq(
      ("key1", 1, 1000L), ("key1", 0, 1001L), ("key2", 1, 1002L),
      ("key1", 1, 1003L), ("key1", 1, 1004L))
    val s = stream(base: _*)
      .flatMap(t => Seq(1, 2).map(i => (t._1, t._2 + i, t._3)))
      .assignEventTime(_._3)
    val out = s.reduceValueStateByKeyTimed[String, Int, Int, Int](
      _._1, _._2, 0, (st, v) => v - st, (_, v) => v).collect()
    // the reference pins Beam's arrival order for ties; a distributed sort
    // does not define one, so the pinned invariant is: per key, SOME
    // ordering of each stamp's two values is threaded sequentially
    // (never state-reset mid-stamp, never interleaved across stamps)
    val valuesByKeyStamp = base
      .flatMap(t => Seq(1, 2).map(i => (t._1, t._3, t._2 + i)))
      .groupBy(x => (x._1, x._2))
      .view.mapValues(_.map(_._3).toSet).toMap
    out.groupBy(_._1).foreach { case (key, rows) =>
      val stamps = rows.map(_._3).distinct.sorted
      // thread candidate states forward; at each stamp the observed output
      // pair must match one processing order of that stamp's value set
      var states = Set(0)
      stamps.foreach { st =>
        val vals = valuesByKeyStamp((key, st))
        val observed = rows.filter(_._3 == st).map(_._2).sorted.toSeq
        val nextStates = for {
          s0 <- states
          perm <- vals.toSeq.permutations
          outs = perm.scanLeft((s0, 0)) { case ((prev, _), v) => (v, v - prev) }
            .drop(1).map(_._2)
          if outs.sorted == observed
        } yield perm.last
        assert(nextStates.nonEmpty,
          s"key=$key stamp=$st observed=$observed inconsistent with " +
            s"sequential threading from states=$states over values=$vals")
        states = nextStates.toSet
      }
    }
    assert(out.length == 10)
  }

  test("testReduceValueStateWithLatenessAndSlidingWindow:910 — lateness + " +
      "keyed state + sliding window composition") {
    val now = 500L
    val s = stream(("key1", now), ("key2", now + 1), ("key1", now + 2))
      .assignEventTime(_._2)
    val reduced = s.windowAll().withAllowedLateness(100).unwindowed
      .reduceValueStateByKeyTimed[String, Long, Long, Long](
        _._1, _._2, Long.MinValue, (_, _) => 1L, (_, v) => v)
    val counts = reduced.timeSlidingWindow(10000, 1000)
      .countByKey(_._1).collect()
    val result = counts.map(_._3).sorted.toSeq
    assert(result == Seq.fill(10)(1L) ++ Seq.fill(10)(2L), result.toString)
  }

  test("testUnionOnDifferentWindows:965 — union of differently-windowed " +
      "aggregates") {
    val a = stream(("key1", 100L)).assignEventTime(_._2).windowAll().count()
    val b = stream(("key2", 200L)).assignEventTime(_._2).timeWindow(5000).count()
    val u = a.union(b).collect()
    assert(u.size == 2)
    assert(u.map(_._2).sorted == Seq(1L, 1L))
  }

  test("testUnionOnDifferentWindowsDifferentTrigger:994 — union of two " +
      "global aggregates") {
    val a = stream(("key", 100L)).assignEventTime(_._2).windowAll().count()
    val b = stream(("key", 200L)).assignEventTime(_._2).windowAll().count()
    assert(a.union(b).collect().map(_._2) == Seq(1L, 1L))
  }

  test("testIntegratePerKeyAfterWindowing:1017 — running aggregate over " +
      "windowed counts") {
    val now = 100L
    val s = stream(("key", now), ("key", now + 2000)).assignEventTime(_._2)
    val counts = s.timeWindow(1000).count() // two windows, one element each
    val integrated = counts.assignEventTime(_._1.start)
      .integratePerKey[String, Long](_ => "", _._2, 0L, _ + _)
    val r = integrated.collect().sortBy(_._2)
    assert(r == Seq(("", 1L), ("", 2L)), r.toString)
  }

  test("testSumDistinctSlidingWindow:1048 — distinct count per sliding " +
      "window (reference fixture)") {
    val s = stream(
      ("key", 1L), ("key2", 50L), ("key", 700L), ("key3", 800L))
      .assignEventTime(_._2)
    val d = s.timeSlidingWindow(1000, 500).distinct(_._1)
    val counts = d.assignEventTime(_._1.start)
      .windowAll().countByKey(_._1).collect()
    assert(counts.size == 3)
    assert(counts.map(_._3).sorted == Seq(2L, 2L, 3L), counts.toString)
  }

  test("testUdfErrorFailIsPropagated:1099 — a throwing closure fails the " +
      "job with the user's exception") {
    val s = stream(1, 2, 3)
    val ex = intercept[Throwable] {
      s.map[Int] { x =>
        if (x >= 0) throw new IllegalStateException(s"user boom on $x")
        x
      }.collect()
    }
    val chain = Iterator.iterate[Throwable](ex)(_.getCause)
      .takeWhile(_ != null).take(10).toSeq
    assert(chain.exists(t => t.isInstanceOf[IllegalStateException] &&
        t.getMessage != null && t.getMessage.contains("user boom")),
      s"user exception not in cause chain: ${chain.map(_.getClass.getName)}")
  }

  // reference fixture testCalendarWindows:1133 — 10 elements spanning 2x
  // the unit from 1600000000000L; expect 2-3 windows summing to 10
  private def calendarCase(unit: String, resolutionMs: Long): Unit = {
    val now = 1600000000000L
    val step = resolutionMs / 5
    val elems = (0 until 10).map(i => (s"k$i", now + i * step))
    val s = stream(elems: _*).assignEventTime(_._2)
    val r = s.calendarWindow(unit, 1, java.util.TimeZone.getDefault.getID)
      .count().collect()
    assert(r.size >= 2 && r.size < 4, s"$unit: ${r.size} windows")
    assert(r.map(_._2).sum == 10L, s"$unit: ${r.toString}")
  }

  test("testCalendarWindowDays:1114")(calendarCase("days", 86400000L))
  test("testCalendarWindowWeeks:1119")(calendarCase("weeks", 7 * 86400000L))
  test("testCalendarWindowMonths:1124")(calendarCase("months", 30 * 86400000L))
  test("testCalendarWindowYears:1129")(calendarCase("years", 365 * 86400000L))

  test("testPrintln:402 — print does not throw") {
    stream(("k", 1)).print()
  }

  test("testGroupReduceConsumed:553 — groupReduce output survives a " +
      "downstream filter") {
    val s = stream(("key1", 1), ("key2", 2), ("key1", 3))
      .assignEventTime(_ => 0L)
    val r = s.windowAll()
      .groupReduce[String, (String, Int)](_._1, (_, k, xs) => Seq((k, xs.size)))
      .filter(_ => true)
      .collect()
    assert(r.toMap == Map("key1" -> 2, "key2" -> 1))
  }
}
