package graft.queries

import org.apache.spark.sql.functions._

import graft.sources.Tables
import graft.sources.Tables.cents

/** Event-time windowing over the `events` stream table — batch lowering of
  * the reference's windowing surface (reference: tools/.../Stream.java:291
  * timeWindow, :300 timeSlidingWindow, :310 sessionWindow, :322
  * calendarWindow, :329 windowAll; Beam impls BeamStream.java:831-883).
  * The same `window`/`session_window` expressions run unchanged under
  * Structured Streaming with `withWatermark` — batch here so the DuckDB
  * oracle can check them.
  *
  * All window boundaries are compared as epoch micros: the events fixture has
  * microsecond timestamps, and millisecond truncation would mis-bucket
  * elements that straddle a boundary by <1ms.
  */
object WindowQueries extends QuerySet {

  /** The events table staged as a three-segment commit log sliced by
    * `event_id % 3` — a batch-membership rule the DuckDB oracle can
    * replay EXACTLY (the stateful-query log slices on approximate stamp
    * terciles, fine for batch-order-independent results but not for a
    * pane ledger whose every row is "cumulative count at batch b").
    */
  private def eventLogModSliced(s: org.apache.spark.sql.SparkSession,
      d: String): graft.streaming.CommitLogFamily =
    StagedLogs.getOrStage(s, d, "window-q") { fam =>
      implicit val ee = graft.core.StreamElement.encoder
      implicit val te = org.apache.spark.sql.Encoders.tuple(
        org.apache.spark.sql.Encoders.STRING,
        org.apache.spark.sql.Encoders.scalaLong,
        org.apache.spark.sql.Encoders.scalaLong,
        org.apache.spark.sql.Encoders.STRING)
      val elems = Tables.events(s, d)
        .select(col("user_id").cast("string"), unix_micros(col("ts")),
          col("event_id").cast("long"), col("event_type"))
        .as[(String, Long, Long, String)]
        .map { case (user, stampUs, id, typ) =>
          graft.core.StreamElement("user", user, s"ev.${id % 8}", s"u-$id",
            id, stampUs, typ.getBytes("UTF-8"),
            delete = false, deleteWildcard = false)
        }
        .persist()
      try {
        StagedLogs.appendOrdered(fam,
          (0L until 3L).map(b => elems.filter(col("seqId") % 3 === b)))
      } finally elems.unpersist()
    }

  val queries: Map[String, QFn] = Map(
    // withEarlyEmitting through the real streaming path: partial
    // per-window results while the window is still open
    // (WindowedStream.withEarlyEmitting:531 → update output mode; the
    // wall-clock ProcessingTime trigger cadence is replaced by
    // one-segment-per-trigger file batches so every pane is
    // deterministic). Three id-sliced micro-batches over hourly
    // tumbling counts per event_type: because every batch contains every
    // type, nearly every (window, type) state cell is updated in ALL
    // three batches — maximal cross-batch running-pane carry-over (a
    // user-keyed variant touches most cells once, verifying far less
    // while emitting ~1M panes at sf1). Lateness is set beyond the
    // fixture's whole time span so no window finalizes early (panes,
    // not final results, are what this row verifies; the
    // watermark-finalization contract is q_window_tumbling + specs).
    "q_window_early_emit_stream" -> ((s, d) => {
      implicit val ee = graft.core.StreamElement.encoder
      val fam = eventLogModSliced(s, d)
      val panes = graft.streaming.EventTimeWindows.tumblingCounts(
        fam.streamFromOldestThrottled(maxFilesPerTrigger = 1)
          .map(e => e.copy(key = new String(e.value, "UTF-8"))),
        sizeMs = 3600000L, allowedLatenessMs = 10L * 365 * 24 * 3600 * 1000)
      StreamSupport.runToMemorySink(s, panes)(_.processAllAvailable())
        .select(col("w_start_us"), col("key").as("event_type"), col("n"))
    }),

    // asUnbounded typed surface end-to-end (Stream.asUnbounded →
    // GUnboundedStream.tumblingAggByKey, the streaming lowering of the
    // typed windowed aggs): hourly counts per event_type over the same
    // three-batch replay, finalized from the update-mode pane ledger by
    // taking each (window, key)'s LAST pane (counts are monotone, so
    // max = final) — the value the window would emit on finalization.
    "q_unbounded_count" -> ((s, d) => {
      implicit val te = org.apache.spark.sql.Encoders.tuple(
        org.apache.spark.sql.Encoders.STRING,
        org.apache.spark.sql.Encoders.scalaDouble,
        org.apache.spark.sql.Encoders.scalaLong)
      val fam = eventLogModSliced(s, d)
      val panes = new graft.api.GUnboundedStream(
        fam.streamFromOldestThrottled(maxFilesPerTrigger = 1), None)
        .assignEventTime(_.stamp)
        .tumblingAggByKey(sizeMs = 3600000L,
          latenessMs = 10L * 365 * 24 * 3600 * 1000)(
          e => new String(e.value, "UTF-8"), _ => 1.0, how = "count")
      StreamSupport.runToMemorySink(s, panes)(_.processAllAvailable())
        .groupBy(col("w_start_us"), col("key"))
        .agg(max(col("agg")).cast("long").as("n"))
        .select(col("w_start_us"), col("key").as("event_type"), col("n"))
    }),

    // WindowedStream.reduce through the TYPED API path (GStream →
    // assignEventTime → timeWindow → reduce, WindowedStream.java:40):
    // an arbitrary-state fold per (hour window, event_type). The
    // accumulator here is order-insensitive (count/sum/min/max) so the
    // oracle is exact at any parallelism — the non-commutative
    // allowance itself is pinned by GStreamSpec. This is the oracle row
    // for the typed surface: every other window row checks the columnar
    // lowering; this one checks the lambda path end-to-end.
    "q_reduce_fold" -> ((s, d) => {
      import s.implicits._
      val ev = Tables.events(s, d)
        .select(col("event_id"), unix_millis(col("ts")),
          col("event_type"), cents(col("value")))
        .as[(Long, Long, String, Long)]
      new graft.api.GStream(ev, None)
        .assignEventTime(_._2)
        .timeWindow(3600000L)
        .reduce[String, (Long, Long, Long, Long)](
          _._3,
          (0L, 0L, Long.MaxValue, Long.MinValue),
          (st, e) => (st._1 + 1, st._2 + e._4,
            math.min(st._3, e._1), math.max(st._4, e._1)))
        .ds
        .select((col("_1.start") * lit(1000L)).cast("long").as("w_start_us"),
          col("_2").as("event_type"), col("_3._1").as("n"),
          col("_3._2").as("sum_cents"), col("_3._3").as("min_id"),
          col("_3._4").as("max_id"))
    }),

    // withAllowedLateness DROP semantics through the real streaming path
    // (WindowedStream.withAllowedLateness; Beam drops panes past
    // lateness): hourly per-type counts over the three-batch replay with
    // 1h allowed lateness, so batch 2's old-window rows are dropped by
    // the stateful operator's late-event filter. Spark's rule, pinned by
    // LatenessProbeSpec: a row is dropped iff its window END <= the
    // late-event watermark in effect for its batch, and that watermark is
    // the one computed at the PREVIOUS batch's planning — i.e. from data
    // through batch b-2 (ms-floored max stamp minus the delay). Batches
    // 0/1 therefore drop nothing and batch 2 filters against
    // floor(max_us(batch 0)/1000)*1000 - 1h. The DuckDB oracle replays
    // exactly that rule; the final value per (window, type) cell is the
    // last (= max, counts are monotone) pane it emitted.
    "q_late_drop" -> ((s, d) => {
      implicit val ee = graft.core.StreamElement.encoder
      val fam = eventLogModSliced(s, d)
      val panes = graft.streaming.EventTimeWindows.tumblingCounts(
        fam.streamFromOldestThrottled(maxFilesPerTrigger = 1)
          .map(e => e.copy(key = new String(e.value, "UTF-8"))),
        sizeMs = 3600000L, allowedLatenessMs = 3600000L)
      StreamSupport.runToMemorySink(s, panes)(_.processAllAvailable())
        .groupBy(col("w_start_us"), col("key"))
        .agg(max(col("n")).as("n"))
        .select(col("w_start_us"), col("key").as("event_type"), col("n"))
    }),

    // late-data split (FilterLatecomers.getOnTime:52/getLate:57): the
    // batch/audit analog — split on-time vs late against the watermark
    // position at the end of the replay (max stamp) with 1h allowed
    // lateness. The bounded max-stamp aggregate is one row to the driver.
    "q_late_split" -> ((s, d) => {
      val ds = Tables.eventsAsChangelog(s, d)
      val wm = ds.agg(max(col("stamp"))).head().getLong(0)
      val (onTime, late) = graft.streaming.EventTimeWindows
        .splitLate(ds, wm, allowedLatenessMs = 3600000L)
      onTime.select(col("seqId").as("event_id")).withColumn("is_late", lit(false))
        .union(late.select(col("seqId").as("event_id")).withColumn("is_late", lit(true)))
    }),

    // timeWindow (tumbling, FixedWindows): hourly per-type counts + sums.
    // Epoch ARITHMETIC, not `window()`: Spark's window() aligns buckets to
    // the SESSION-zone epoch (a Chicago session shifts every hourly bucket
    // 6h — VanillaSessionSpec caught this), while FixedWindows.assign and
    // the DuckDB oracle are plain UTC-epoch floors. Same plan shape (one
    // hash aggregate), minus the struct expansion.
    "q_window_tumbling" -> ((s, d) => {
      val us = unix_micros(col("ts"))
      val sizeUs = 3600L * 1000000L
      Tables.events(s, d)
        .groupBy((us - pmod(us, lit(sizeUs))).as("w_start_us"), col("event_type"))
        .agg(count(lit(1)).as("n"), sum(cents(col("value"))).as("sum_cents"))
    }),

    // union of DIFFERENTLY-windowed aggregates over one source — the
    // GroovyEnvTest.testUnionOnDifferentWindows:965 composite at data
    // scale: hourly tumbling counts unioned with the global-window count
    // (sentinel w_start_us = -1). One scan feeds both legs; the union is
    // plan-level (no shuffle of its own)
    "q_window_union" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val us = unix_micros(col("ts"))
      val sizeUs = 3600L * 1000000L
      val tumbling = ev
        .groupBy((us - pmod(us, lit(sizeUs))).as("w_start_us"))
        .agg(count(lit(1)).as("n"))
      val global = ev.agg(count(lit(1)).as("n"))
        .select(lit(-1L).as("w_start_us"), col("n"))
      tumbling.union(global)
    }),

    // burst/anomaly detection over tumbling windows: flag the hourly
    // windows where a user's count exceeds 2x their own per-active-window
    // average — integer CROSS-MULTIPLY (n·n_windows > 2·total), no
    // division, no floats. Two partial-agg passes + one user-keyed join;
    // the ops-telemetry capability a monitoring pipeline runs on streams
    "q_burst_windows" -> ((s, d) => {
      val us = unix_micros(col("ts"))
      val sizeUs = 3600L * 1000000L
      val w = Tables.events(s, d)
        .groupBy(col("user_id"), (us - pmod(us, lit(sizeUs))).as("w_start_us"))
        .agg(count(lit(1)).as("n"))
      val tot = w.groupBy(col("user_id"))
        .agg(sum(col("n")).as("total_n"), count(lit(1)).as("n_windows"))
      w.join(tot, "user_id")
        .filter(col("n") * col("n_windows") > lit(2L) * col("total_n"))
        .select(col("user_id"), col("w_start_us"), col("n"),
          col("total_n"), col("n_windows"))
    }),

    // ordered funnel (view → click → purchase, each step within 24h of
    // the previous): the product-analytics sequence query. Step k is one
    // user-keyed partial-agg min over events gated by step k-1's time —
    // three passes, each shuffle user-keyed and co-partitioned, the
    // per-step gate table user-sized (AQE broadcasts it). sf0.01 funnel:
    // 150 → 60 → 25
    "q_funnel" -> ((s, d) => {
      val stepUs = 24L * 3600L * 1000000L
      val ev = Tables.events(s, d).select(col("user_id"),
        unix_micros(col("ts")).as("us"), col("event_type"))
      val a = ev.filter(col("event_type") === "view")
        .groupBy(col("user_id")).agg(min(col("us")).as("t1_us"))
      val b = ev.filter(col("event_type") === "click").join(a, "user_id")
        .filter(col("us") > col("t1_us") &&
          col("us") <= col("t1_us") + stepUs)
        .groupBy(col("user_id")).agg(min(col("us")).as("t2_us"))
      val c = ev.filter(col("event_type") === "purchase").join(b, "user_id")
        .filter(col("us") > col("t2_us") &&
          col("us") <= col("t2_us") + stepUs)
        .groupBy(col("user_id")).agg(min(col("us")).as("t3_us"))
      a.join(b, Seq("user_id"), "left").join(c, Seq("user_id"), "left")
        .select(col("user_id"), col("t1_us"), col("t2_us"), col("t3_us"))
    }),

    // last-touch attribution: each purchase attributed to the LATEST
    // preceding non-purchase event of the same user. The candidate is a
    // running window max over a PACKED integer (us·10 + type_code —
    // micros fit int64 with an order of magnitude to spare), so the
    // tie-break is part of the value and both engines agree; the window
    // partitions by user (user-bounded, never corpus-wide)
    "q_attribution" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val us = unix_micros(col("ts"))
      val code = when(col("event_type") === "view", 1L)
        .when(col("event_type") === "click", 2L)
        .when(col("event_type") === "signup", 3L)
        .when(col("event_type") === "error", 4L).otherwise(0L)
      val packed = when(col("event_type") =!= "purchase", us * 10L + code)
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("us"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, -1)
      Tables.events(s, d)
        .select(col("event_id"), col("user_id"), us.as("us"),
          col("event_type"), packed.as("__p"))
        .withColumn("__attr", max(col("__p")).over(w))
        .filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"),
          when(col("__attr").isNull, lit(null).cast("string"))
            .otherwise(element_at(
              lit(Array("none", "view", "click", "signup", "error")),
              (col("__attr") % 10).cast("int") + 1)).as("attributed_type"),
          when(col("__attr").isNull, lit(null).cast("long"))
            .otherwise(col("us") - expr("__attr div 10")).as("gap_us"))
    }),

    // inter-event gap quantiles per event type (telemetry latency
    // profile): gaps from a USER-bounded lag window (deterministic
    // (us, event_id) order), quantiles via the exact histogram selection
    // — no per-type row sort ever touches the corpus
    "q_gap_quantiles" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val us = unix_micros(col("ts"))
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("us"), col("event_id"))
      val gaps = Tables.events(s, d)
        .select(col("user_id"), col("event_id"), col("event_type"),
          us.as("us"))
        .withColumn("gap_us", col("us") - lag(col("us"), 1).over(w))
        .filter(col("gap_us").isNotNull)
      graft.functions.Curation
        .exactQuantiles(gaps, "event_type", "gap_us", Seq(50, 90, 99))
    }),

    // cohort retention: users bucketed by first-activity week, fraction
    // still active k weeks later — integer epoch-week arithmetic,
    // retention in basis points. Two user-keyed partial-agg passes + one
    // cohort-keyed agg; the cohort-size table is week-bounded (broadcast)
    "q_retention_cohorts" -> ((s, d) => {
      val weekUs = 7L * 24L * 3600L * 1000000L
      val us = unix_micros(col("ts"))
      val ev = Tables.events(s, d)
        .select(col("user_id"), (us - pmod(us, lit(weekUs))).as("w"))
      val first = ev.groupBy(col("user_id")).agg(min(col("w")).as("cw"))
      val act = ev.distinct()
      val sizes = first.groupBy(col("cw"))
        .agg(count(lit(1)).as("n_cohort"))
      act.join(first, "user_id")
        .select(col("cw"), expr(s"(w - cw) div $weekUs").as("week_offset"))
        .groupBy(col("cw"), col("week_offset"))
        .agg(count(lit(1)).as("n_active"))
        .join(broadcast(sizes), "cw")
        .select(col("cw").as("cohort_week_us"), col("week_offset"),
          col("n_active"), col("n_cohort"),
          expr("n_active * 10000L div n_cohort").as("retention_bp"))
    }),

    // timeSlidingWindow (SlidingWindows): 1h window, 30m slide — each
    // element expands to its size/slide covering windows via `sequence`
    // (epoch-aligned, session-zone-free; see q_window_tumbling)
    "q_window_sliding" -> ((s, d) => {
      val us = unix_micros(col("ts"))
      val slideUs = 1800L * 1000000L
      val lastStart = us - pmod(us, lit(slideUs))
      Tables.events(s, d)
        .select(col("value"), explode(sequence(lastStart - lit(slideUs),
          lastStart, lit(slideUs))).as("w_start_us"))
        .groupBy(col("w_start_us"))
        .agg(count(lit(1)).as("n"), sum(cents(col("value"))).as("sum_cents"))
    }),

    // sessionWindow(keyEx, gap) (Sessions.withGapDuration): per-user sessions
    // with a 30-minute inactivity gap
    "q_window_session" -> ((s, d) => {
      Tables.events(s, d)
        .groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("w"))
        .agg(count(lit(1)).as("n"), sum(cents(col("value"))).as("sum_cents"))
        .select(col("user_id"), unix_micros(col("w.start")).as("sess_start_us"),
          col("n"), col("sum_cents"))
    }),

    // calendarWindow("months", 1, UTC) (CalendarWindows.java): monthly buckets
    // are plain column expressions — no custom WindowFn needed on Spark
    "q_window_calendar_month" -> ((s, d) => {
      Tables.orders(s, d)
        .groupBy(year(col("o_orderdate")).as("y"), month(col("o_orderdate")).as("m"))
        .agg(count(lit(1)).as("n"), sum(cents(col("o_totalprice"))).as("sum_cents"))
    }),

    // calendarWindow("weeks", 1, UTC) through the REAL window-assignment
    // class — ISO Monday bucketing is the trickiest calendar unit, and
    // DuckDB's date_trunc('week') implements the same ISO rule, so the
    // CalendarWindows.assign arithmetic itself gets hash-verified
    // (CalendarWindows.java weeks; graft.api.CalendarWindows)
    "q_window_calendar_week" -> ((s, d) => {
      import s.implicits._
      val win = graft.api.CalendarWindows("weeks", 1, "UTC")
      Tables.events(s, d)
        .select(col("user_id"), unix_millis(col("ts")), cents(col("value")))
        .as[(Long, Long, Long)]
        .map { case (u, ms, c) => (u, win.assign(ms).head.start, c) }
        .toDF("user_id", "week_start_ms", "c")
        .groupBy(col("user_id"), col("week_start_ms"))
        .agg(count(lit(1)).as("n"), sum(col("c")).as("sum_cents"))
    }),

    // batchUpdates(start, end) (BeamStream.batchUpdates:215, start incl /
    // end excl): stamp-range scan, pushed down to the parquet reader
    "q_batch_updates_range" -> ((s, d) => {
      Tables.events(s, d)
        // micros-built literals: a string→timestamp cast reads the SESSION
        // zone; timestamp_micros is an absolute instant in any session and
        // still folds to a pushable parquet predicate
        .filter(col("ts") >= timestamp_micros(lit(1704844800000000L)) &&
          col("ts") < timestamp_micros(lit(1705708800000000L)))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), sum(cents(col("value"))).as("sum_cents"))
    }),

    // reduceToLatest (WindowedStream.java:108 → PCollectionTools
    // .reduceAsSnapshot:42): latest element per key — max_by over a
    // (stamp, seqId) struct keeps it a single partial-aggregable pass
    "q_reduce_to_latest" -> ((s, d) => {
      Tables.events(s, d)
        .select(col("user_id"),
          struct(unix_micros(col("ts")).as("ts_us"), col("event_id"),
            col("event_type")).as("e"))
        .groupBy(col("user_id"))
        .agg(max(col("e")).as("last"))
        .select(col("user_id"), col("last.ts_us").as("last_ts_us"),
          col("last.event_id").as("last_event_id"),
          col("last.event_type").as("last_type"))
    })
  )

  val oracles: Map[String, String] = Map(
    // pane ledger replay: batch b's pane for a (window, user) with new
    // data = running count over batches <= b
    "q_window_early_emit_stream" ->
      """WITH e AS (
        |  SELECT event_type,
        |         CAST(floor(epoch_us(ts) / 3600000000) AS BIGINT) * 3600000000 AS w_start_us,
        |         event_id % 3 AS b
        |  FROM events
        |), agg AS (
        |  SELECT w_start_us, event_type, b, count(*) AS nb FROM e GROUP BY 1, 2, 3
        |)
        |SELECT w_start_us, event_type,
        |       CAST(sum(nb) OVER (PARTITION BY w_start_us, event_type
        |         ORDER BY b) AS BIGINT) AS n
        |FROM agg""".stripMargin,

    "q_unbounded_count" ->
      """SELECT CAST(floor(epoch_us(ts) / 3600000000) AS BIGINT) * 3600000000 AS w_start_us,
        |event_type, count(*) AS n
        |FROM events GROUP BY 1, 2""".stripMargin,

    "q_reduce_fold" ->
      """SELECT CAST(floor(epoch_us(ts) / 3600000000) AS BIGINT) * 3600000000 AS w_start_us,
        |event_type, count(*) AS n,
        |CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT) AS sum_cents,
        |min(event_id) AS min_id, max(event_id) AS max_id
        |FROM events GROUP BY 1, 2""".stripMargin,

    // replay of the pinned drop rule: batch b's late-filter watermark is
    // built from data through batch b-2 (so only batch 2 drops), value
    // floor(max_ms(batch 0)) - 1h, and a row survives iff w_end > wm
    "q_late_drop" ->
      """WITH e AS (
        |  SELECT event_type,
        |         CAST(floor(epoch_us(ts) / 3600000000) AS BIGINT) * 3600000000 AS w_start_us,
        |         epoch_us(ts) AS us, event_id % 3 AS b
        |  FROM events
        |), wm2 AS (
        |  SELECT (CAST(floor(max(us) / 1000) AS BIGINT) - 3600000) * 1000 AS wm_us
        |  FROM e WHERE b = 0
        |)
        |SELECT w_start_us, event_type, count(*) AS n
        |FROM e
        |WHERE b < 2 OR w_start_us + 3600000000 > (SELECT wm_us FROM wm2)
        |GROUP BY 1, 2""".stripMargin,

    "q_late_split" ->
      """SELECT event_id,
        |epoch_us(ts) < (SELECT max(epoch_us(ts)) FROM events) - 3600000000
        |  AS is_late
        |FROM events""".stripMargin,

    "q_burst_windows" ->
      """WITH w AS (
        |  SELECT user_id,
        |         CAST(floor(epoch_us(ts) / 3600000000) AS BIGINT) * 3600000000 AS w_start_us,
        |         CAST(count(*) AS BIGINT) AS n
        |  FROM events GROUP BY 1, 2
        |), t AS (
        |  SELECT user_id, CAST(sum(n) AS BIGINT) AS total_n,
        |         CAST(count(*) AS BIGINT) AS n_windows
        |  FROM w GROUP BY 1
        |)
        |SELECT w.user_id, w.w_start_us, w.n, t.total_n, t.n_windows
        |FROM w JOIN t USING (user_id)
        |WHERE w.n * t.n_windows > 2 * t.total_n""".stripMargin,

    "q_gap_quantiles" ->
      """WITH g AS (
        |  SELECT event_type,
        |         epoch_us(ts) - lag(epoch_us(ts)) OVER (PARTITION BY user_id
        |           ORDER BY epoch_us(ts), event_id) AS gap_us
        |  FROM events
        |), gg AS (
        |  SELECT event_type, gap_us FROM g WHERE gap_us IS NOT NULL
        |), c AS (
        |  SELECT event_type, count(*) AS n FROM gg GROUP BY 1
        |), r AS (
        |  SELECT event_type, gap_us,
        |         row_number() OVER (PARTITION BY event_type
        |           ORDER BY gap_us) AS rn
        |  FROM gg
        |)
        |SELECT r.event_type,
        |  CAST(max(CASE WHEN rn = (n * 50 + 99) // 100 THEN gap_us END) AS BIGINT) AS p50,
        |  CAST(max(CASE WHEN rn = (n * 90 + 99) // 100 THEN gap_us END) AS BIGINT) AS p90,
        |  CAST(max(CASE WHEN rn = (n * 99 + 99) // 100 THEN gap_us END) AS BIGINT) AS p99
        |FROM r JOIN c USING (event_type)
        |GROUP BY 1""".stripMargin,

    "q_attribution" ->
      """WITH e AS (
        |  SELECT event_id, user_id, epoch_us(ts) AS us, event_type,
        |         CASE WHEN event_type <> 'purchase' THEN epoch_us(ts) * 10 +
        |           CASE event_type WHEN 'view' THEN 1 WHEN 'click' THEN 2
        |                WHEN 'signup' THEN 3 WHEN 'error' THEN 4
        |                ELSE 0 END
        |         END AS p
        |  FROM events
        |), m AS (
        |  SELECT event_id, user_id, us, event_type,
        |         max(p) OVER (PARTITION BY user_id ORDER BY us, event_id
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS attr
        |  FROM e
        |)
        |SELECT event_id, user_id,
        |       CASE WHEN attr IS NULL THEN NULL
        |            ELSE (['none', 'view', 'click', 'signup', 'error'])
        |                   [CAST(attr % 10 AS INT) + 1] END AS attributed_type,
        |       CASE WHEN attr IS NULL THEN NULL
        |            ELSE us - attr // 10 END AS gap_us
        |FROM m WHERE event_type = 'purchase'""".stripMargin,

    "q_retention_cohorts" ->
      """WITH ev AS (
        |  SELECT DISTINCT user_id,
        |         CAST(floor(epoch_us(ts) / 604800000000) AS BIGINT)
        |           * 604800000000 AS w
        |  FROM events
        |), first AS (
        |  SELECT user_id, min(w) AS cw FROM ev GROUP BY 1
        |), sizes AS (
        |  SELECT cw, CAST(count(*) AS BIGINT) AS n_cohort
        |  FROM first GROUP BY 1
        |), act AS (
        |  SELECT f.cw, (e.w - f.cw) // 604800000000 AS week_offset,
        |         CAST(count(*) AS BIGINT) AS n_active
        |  FROM ev e JOIN first f ON f.user_id = e.user_id
        |  GROUP BY 1, 2
        |)
        |SELECT a.cw AS cohort_week_us, a.week_offset, a.n_active,
        |       s.n_cohort,
        |       CAST(a.n_active * 10000 // s.n_cohort AS BIGINT) AS retention_bp
        |FROM act a JOIN sizes s USING (cw)""".stripMargin,

    "q_funnel" ->
      """WITH a AS (
        |  SELECT user_id, min(epoch_us(ts)) AS t1_us FROM events
        |  WHERE event_type = 'view' GROUP BY 1
        |), b AS (
        |  SELECT e.user_id, min(epoch_us(e.ts)) AS t2_us
        |  FROM events e JOIN a ON a.user_id = e.user_id
        |   AND epoch_us(e.ts) > a.t1_us
        |   AND epoch_us(e.ts) <= a.t1_us + 86400000000
        |  WHERE e.event_type = 'click' GROUP BY 1
        |), c AS (
        |  SELECT e.user_id, min(epoch_us(e.ts)) AS t3_us
        |  FROM events e JOIN b ON b.user_id = e.user_id
        |   AND epoch_us(e.ts) > b.t2_us
        |   AND epoch_us(e.ts) <= b.t2_us + 86400000000
        |  WHERE e.event_type = 'purchase' GROUP BY 1
        |)
        |SELECT a.user_id, a.t1_us, b.t2_us, c.t3_us
        |FROM a LEFT JOIN b USING (user_id) LEFT JOIN c USING (user_id)""".stripMargin,

    "q_window_tumbling" ->
      """SELECT CAST(floor(epoch_us(ts) / 3600000000) AS BIGINT) * 3600000000 AS w_start_us,
        |event_type, count(*) AS n,
        |CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT) AS sum_cents
        |FROM events GROUP BY 1, 2""".stripMargin,

    "q_window_union" ->
      """SELECT CAST(floor(epoch_us(ts) / 3600000000) AS BIGINT) * 3600000000 AS w_start_us,
        |count(*) AS n FROM events GROUP BY 1
        |UNION ALL
        |SELECT CAST(-1 AS BIGINT) AS w_start_us, count(*) AS n FROM events""".stripMargin,

    // every event belongs to exactly two 1h/30m sliding windows:
    // starts floor(e/30m)*30m and that minus 30m
    "q_window_sliding" ->
      """WITH x AS (
        |  SELECT (CAST(floor(epoch_us(ts) / 1800000000) AS BIGINT) - k.k) * 1800000000 AS w_start_us,
        |         value
        |  FROM events CROSS JOIN (SELECT unnest([0, 1]) AS k) k
        |)
        |SELECT w_start_us, count(*) AS n,
        |CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT) AS sum_cents
        |FROM x GROUP BY 1""".stripMargin,

    // gaps-and-islands: new session when gap >= 30 minutes (session_window
    // extends [ts, ts+gap), so an event at exactly prev+gap starts fresh)
    "q_window_session" ->
      """WITH t AS (
        |  SELECT user_id, epoch_us(ts) AS e, value,
        |         CASE WHEN epoch_us(ts) - lag(epoch_us(ts))
        |                OVER (PARTITION BY user_id ORDER BY ts) >= 1800000000
        |              THEN 1 ELSE 0 END AS new_sess
        |  FROM events
        |), g AS (
        |  SELECT user_id, e, value,
        |         sum(new_sess) OVER (PARTITION BY user_id ORDER BY e
        |           ROWS UNBOUNDED PRECEDING) AS sess
        |  FROM t
        |)
        |SELECT user_id, min(e) AS sess_start_us, count(*) AS n,
        |CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT) AS sum_cents
        |FROM g GROUP BY user_id, sess""".stripMargin,

    "q_window_calendar_month" ->
      """SELECT year(o_orderdate) AS y, month(o_orderdate) AS m, count(*) AS n,
        |CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT) AS sum_cents
        |FROM orders GROUP BY 1, 2""".stripMargin,

    "q_window_calendar_week" ->
      """SELECT user_id, epoch_ms(date_trunc('week', ts)) AS week_start_ms,
        |count(*) AS n,
        |CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT) AS sum_cents
        |FROM events GROUP BY 1, 2""".stripMargin,

    "q_batch_updates_range" ->
      """SELECT event_type, count(*) AS n,
        |CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT) AS sum_cents
        |FROM events
        |WHERE ts >= TIMESTAMP '2024-01-10 00:00:00' AND ts < TIMESTAMP '2024-01-20 00:00:00'
        |GROUP BY event_type""".stripMargin,

    "q_reduce_to_latest" ->
      """SELECT user_id, ts_us AS last_ts_us, event_id AS last_event_id,
        |event_type AS last_type
        |FROM (
        |  SELECT user_id, epoch_us(ts) AS ts_us, event_id, event_type,
        |         row_number() OVER (PARTITION BY user_id
        |           ORDER BY ts DESC, event_id DESC) AS rn
        |  FROM events
        |) WHERE rn = 1""".stripMargin
  )
}
