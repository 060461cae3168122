package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

import graft.core.StreamElement
import graft.sources.Tables
import graft.sources.Tables.cents
import graft.streaming.StateOps

/** Keyed-state operators, batch lowering. The reference executes these as
  * time-sorted stateful DoFns (reference: tools/.../Stream.java:520
  * integratePerKey, :386 reduceValueStateByKey; BeamStream.java:1498
  * IntegrateDoFn, :1544 AbstractReduceValueStateByKey). On bounded data the
  * idiomatic Spark lowering is a window function — one shuffle on the key,
  * spill-safe sort within partitions, full codegen — rather than an
  * imperative per-key loop. The streaming lowerings live in
  * [[graft.streaming]] as transformWithState processors.
  */
object StatefulQueries extends QuerySet {

  private val byUserTime = Window.partitionBy(col("user_id"))
    .orderBy(col("ts"), col("event_id"))

  /** The events table as a bounded StreamElement changelog (key = user,
    * attribute = ev.<event_id % 8> so one wildcard cell owns several
    * suffixes, stamp = event-time micros, seqId = event_id, value =
    * "<cents>|<event_type>" so every streaming oracle query extracts its
    * field from ONE shared log), staged into a scratch
    * [[graft.streaming.CommitLogFamily]] as three stamp-range segment
    * files. Everything stays distributed — each segment is one Spark
    * write job (coalesced to a single log segment), nothing is collected
    * to the driver — so the streaming oracle queries exercise the
    * PRODUCTION source→stateful-op path: commit-log replay with
    * `maxFilesPerTrigger=1` turns the three segments into three
    * stamp-ordered micro-batches, forcing real cross-batch state
    * carry-over through the file-source checkpointing machinery rather
    * than a driver-fed MemoryStream.
    *
    * The log is deterministic given the sf dir, so it is staged ONCE per
    * JVM per sf dir and shared by all streaming oracle queries (bench and
    * verify run them in one session — re-staging per query would triple
    * the scratch writes); a shutdown hook removes the scratch dirs, so
    * repeated runs in one session still cannot accumulate storage.
    */
  private def sharedEventLog(s: SparkSession, d: String): graft.streaming.CommitLogFamily =
    StagedLogs.getOrStage(s, d, "state-q") { fam =>
      implicit val enc = StreamElement.encoder
      implicit val rowEnc = org.apache.spark.sql.Encoders.tuple(
        org.apache.spark.sql.Encoders.STRING, org.apache.spark.sql.Encoders.scalaLong,
        org.apache.spark.sql.Encoders.scalaLong, org.apache.spark.sql.Encoders.STRING)
      val elems = Tables.events(s, d)
        .select(col("user_id").cast("string"), unix_micros(col("ts")),
          col("event_id").cast("long"),
          concat(cents(col("value")).cast("string"), lit("|"), col("event_type")))
        .as[(String, Long, Long, String)]
        .map { case (user, stampUs, id, pay) =>
          StreamElement("user", user, s"ev.${id % 8}", s"u-$id", id, stampUs,
            pay.getBytes("UTF-8"), delete = false, deleteWildcard = false)
        }
        .persist()
      try {
        // slice on stamp terciles: per-key event-time order is preserved
        // across segments (ties never straddle a boundary), which is all
        // the per-batch-sorting state operators need for global-order
        // semantics
        val cuts = elems.stat.approxQuantile("stamp", Array(1.0 / 3, 2.0 / 3), 0.001)
        val (c1, c2) = (cuts(0).toLong, cuts(1).toLong)
        StagedLogs.appendOrdered(fam, Seq(
          elems.filter(col("stamp") < c1),
          elems.filter(col("stamp") >= c1 && col("stamp") < c2),
          elems.filter(col("stamp") >= c2)))
      } finally elems.unpersist()
    }

  /** Four seqId-sliced segments (`seqId % 4`) with ordered mtimes — the
    * fixture for the throughput-limiting oracle: each slice is one log
    * file, so `maxFilesPerTrigger = 1` must replay them as four
    * single-slice micro-batches in staging order.
    */
  private def throttleLog(s: SparkSession, d: String): graft.streaming.CommitLogFamily =
    StagedLogs.getOrStage(s, d, "throttle-q") { fam =>
      val elems = Tables.eventsAsChangelog(s, d).persist()
      try StagedLogs.appendOrdered(fam,
        (0 until 4).map(i => elems.filter(col("seqId") % 4 === i)))
      finally elems.unpersist()
    }

  /** The events table staged for the EARLY-EMIT oracle: high-cardinality
    * keys (`user:event_id%7`, so per-batch absences — the "quiet key"
    * the timer exists for — actually occur), `event_id % 3` batch
    * slicing the oracle can replay exactly, plus a FOURTH single-element
    * "poke" segment at the exact global max stamp. The poke guarantees a
    * final data batch in which the watermark (always one batch behind
    * the data) has reached max−delay, so every due timer fires inside a
    * batch `processAllAvailable` is obliged to wait for — and because
    * the poke does not advance the max stamp, no further
    * watermark-advance batch ever runs. The fire pattern is then a
    * closed-form function of per-key batch membership.
    */
  private def earlyEmitLog(s: SparkSession, d: String): graft.streaming.CommitLogFamily =
    StagedLogs.getOrStage(s, d, "early-q") { fam =>
      implicit val enc = StreamElement.encoder
      implicit val rowEnc = org.apache.spark.sql.Encoders.tuple(
        org.apache.spark.sql.Encoders.STRING,
        org.apache.spark.sql.Encoders.scalaLong,
        org.apache.spark.sql.Encoders.scalaLong)
      val elems = Tables.events(s, d)
        .select(concat(col("user_id").cast("string"), lit(":"),
            (col("event_id") % 7).cast("string")),
          unix_micros(col("ts")), col("event_id").cast("long"))
        .as[(String, Long, Long)]
        .map { case (key, stampUs, id) =>
          StreamElement("user", key, "ev", s"u-$id", id, stampUs,
            Array.empty[Byte], delete = false, deleteWildcard = false)
        }
        .persist()
      try {
        val maxUs = elems.agg(max(col("stamp"))).head().getLong(0)
        val poke = s.createDataset(Seq(
          StreamElement("user", "poke", "ev", "u-poke", -1L, maxUs,
            Array.empty[Byte], delete = false, deleteWildcard = false)))(enc)
        StagedLogs.appendOrdered(fam,
          (0L until 3L).map(b => elems.filter(col("seqId") % 3 === b)) :+ poke)
      } finally elems.unpersist()
    }

  /** The cents half of the shared-log payload. */
  private def payCents(e: StreamElement): Double = {
    val v = new String(e.value, "UTF-8")
    v.substring(0, v.indexOf('|')).toDouble
  }

  /** The event_type half of the shared-log payload. */
  private def payType(e: StreamElement): String = {
    val v = new String(e.value, "UTF-8")
    v.substring(v.indexOf('|') + 1)
  }

  /** Run `f` over the shared staged commit log replayed one segment per
    * micro-batch and return the (sink-decoupled, lineage-truncated)
    * result table.
    */
  private def runStreamed[T](s: SparkSession, d: String)(
      f: Dataset[StreamElement] => Dataset[T]): DataFrame = {
    val fam = sharedEventLog(s, d)
    StreamSupport.runToMemorySink(s,
      f(fam.streamFromOldestThrottled(maxFilesPerTrigger = 1))) { q =>
      q.processAllAvailable()
    }
  }

  val queries: Map[String, QFn] = Map(
    // integratePerKey: running prefix-sum per key in event-time order,
    // one output per input (Stream.java:520)
    "q_integrate_per_key" -> ((s, d) => {
      Tables.events(s, d)
        .withColumn("run_cents",
          sum(cents(col("value")))
            .over(byUserTime.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .select(col("event_id"), col("user_id"), col("run_cents"))
    }),

    // CHAINED stateful ops — reduceValueStateByKey piped into
    // integratePerKey with a re-key between them (GroovyEnvTest
    // .testReduceValueWithIntegratePerKey:749: per-key "changes only"
    // state machine, then a running aggregate of those changes in global
    // event-time order). Stage 1: per-user value diff (state = previous
    // cents, output = v - s, update s = v). Stage 2: running sum of the
    // diffs per event_type in event-time order — the timestamp propagates
    // across the chain exactly as the reference's Beam elements carry
    // theirs. Both stages are window functions: one shuffle each,
    // spill-safe sort, full codegen; ties broken by event_id.
    "q_integrate_after_reduce_state" -> ((s, d) => {
      val v = cents(col("value"))
      val diffed = Tables.events(s, d)
        .withColumn("diff",
          v - lag(v, 1, 0L).over(byUserTime))
      diffed
        .withColumn("run_diff",
          sum(col("diff")).over(Window.partitionBy(col("event_type"))
            .orderBy(col("ts"), col("event_id"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .select(col("event_id"), col("event_type"), col("run_diff"))
    }),

    // reduceValueStateByKey (sorted): state = previous event_type; per
    // element emit output(state, v) then update state (Stream.java:386).
    // The "emit previous" shape is exactly event-time lag.
    "q_reduce_value_state" -> ((s, d) => {
      Tables.events(s, d)
        .withColumn("prev_type",
          lag(col("event_type"), 1, "none").over(byUserTime))
        .select(col("event_id"), col("user_id"), col("prev_type"))
    }),

    // reduceValueStateByKeyUnsorted (Stream.java:386 sorted=false):
    // arrival-order fold with NO event-time sort. Per-element outputs
    // are order-dependent in general, so the probe uses an accumulator
    // whose output MULTISET is order-invariant: value 1, state += v,
    // emit state+v → each user emits exactly {1..n}. The row drives the
    // real unsorted lowering (repartition + key-only sortWithinPartitions
    // + mapPartitions state machine) end-to-end; the order-sensitive
    // variant is pinned by GStreamSpec.
    "q_reduce_value_state_unsorted" -> ((s, d) => {
      import s.implicits._
      val ev = Tables.events(s, d)
        .select(col("user_id"), col("event_id"))
        .as[(Long, Long)]
      new graft.api.GStream(ev, None)
        .reduceValueStateByKeyUnsorted[Long, Long, Long, Long](
          _._1, _ => 1L, 0L, (st, v) => st + v, (st, v) => st + v)
        .ds
        .toDF("user_id", "ordinal")
    }),

    // integratePerKey through the STREAMING lowering (StateOps,
    // flatMapGroupsWithState): same semantics as q_integrate_per_key,
    // answered by the transformWithState-path code so the streaming
    // implementation gets its own oracle signal (BeamStream.java:1498)
    "q_integrate_per_key_stream" -> ((s, d) => {
      runStreamed(s, d) { ds =>
        StateOps.integratePerKey(ds, 0.0, payCents, _ + _)
      }.select(col("_1").as("user_key"), col("_2").as("stamp_us"),
        col("_3").cast("long").as("run_cents"))
    }),

    // reduceValueStateByKey through the STREAMING lowering: state =
    // previous event_type, emit-then-update (BeamStream.java:1544)
    "q_reduce_value_state_stream" -> ((s, d) => {
      import org.apache.spark.sql.Encoders
      implicit val oe = Encoders.tuple(Encoders.STRING,
        Encoders.tuple(Encoders.scalaLong, Encoders.STRING))
      implicit val se = Encoders.STRING
      runStreamed(s, d) { ds =>
        StateOps.reduceValueStateByKey[String, (Long, String)](ds, "none",
          (st, e) => (e.seqId, st),
          (_, e) => payType(e))
      }.select(col("_1").as("user_key"), col("_2._1").as("event_id"),
        col("_2._2").as("prev_type"))
    }),

    // reduceValueStateByKey with the EARLY-EMIT timer loop
    // (BeamStream.java:1596-1622 AbstractReduceValueStateByKey onTimer):
    // a key that is quiet while the watermark advances a full interval
    // re-emits output(state, null). Per-element panes are the running
    // ordinal ((event_id, n) with n = fold position); timer panes are
    // (-1, count-so-far). Determinism: the 4-segment early-q log gives
    // the watermark trajectory wm(b) = maxStamp(batches < b) − delay;
    // `disorder` = 60 d (> the 30 d span) so the late-event filter never
    // drops a row, and `earlyEmit` = 1 d far exceeds any gap between
    // successive batch maxima, so a fired-and-idle cell's re-armed
    // deadline (lastFireWm + 1 d) is past the final watermark — a
    // SECOND timer pane needs a batch-2 arrival after a batch-1 fire
    // (the arrival re-arms from its own, possibly old, stamp), the one
    // double-fire path the oracle's fire3 branch encodes.
    // A key therefore fires at the first batch where it
    // has no data and its armed deadline (max(lastEventMs + 1 d,
    // armingWm + 1 ms), all on the stamp clock) is strictly below that
    // batch's watermark; the poke batch is the final chance with the
    // watermark at maxStamp. The DuckDB oracle replays exactly that
    // closed form. LatenessProbeSpec pins the watermark-lag contract;
    // StateCleanupSpec pins the timer cadence semantics.
    "q_reduce_value_state_early" -> ((s, d) => {
      import org.apache.spark.sql.Encoders
      import scala.concurrent.duration._
      implicit val oe = Encoders.tuple(Encoders.STRING,
        Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong))
      implicit val se = Encoders.scalaLong
      val fam = earlyEmitLog(s, d)
      val out = StateOps.reduceValueStateByKey[Long, (Long, Long)](
        fam.streamFromOldestThrottled(maxFilesPerTrigger = 1), 0L,
        (st, e) => if (e == null) (-1L, st) else (e.seqId, st + 1),
        (st, _) => st + 1,
        earlyEmit = Some(1.day),
        disorder = Some(60.days))
      StreamSupport.runToMemorySink(s, out)(_.processAllAvailable())
        .filter(col("_1") =!= "poke")
        .select(col("_1").as("user_key"), col("_2._1").as("event_id"),
          col("_2._2").as("n"))
    }),

    // snapshotUpdates through the STREAMING lowering: the CachedView
    // maintenance query (LocalCachedPartitionedView.java:59) replayed
    // from a commit log in three micro-batches. Events land in wildcard
    // attributes ev.<bucket> so one state cell owns several suffixes;
    // the emitted upsert changelog's final winner per (key, attribute)
    // must equal the latest event per (user, bucket)
    "q_snapshot_updates_stream" -> ((s, d) => {
      val changelog = runStreamed(s, d) { ds =>
        StateOps.snapshotUpdates(ds)
      }
      val w = Window.partitionBy(col("key"), col("attribute"))
        .orderBy(col("stamp").desc, col("seqId").desc)
      changelog
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("key").as("user_key"), col("attribute").as("attr"),
          split(col("value").cast("string"), "\\|").getItem(0)
            .cast("long").as("val_cents"))
    }),

    // streamFromOldest replay itself, oracle-checked: the commit-log
    // subscription (CommitLogReader.java:37, position=OLDEST) replayed
    // across three micro-batches must deliver every element bit-exact —
    // key, attribute, sequence id, stamp and payload all hash-matched
    // against the source table. The *_stream state queries above verify
    // the operators ON this source; this row verifies the source itself.
    "q_stream_from_oldest" -> ((s, d) => {
      import org.apache.spark.sql.Encoders
      implicit val oe = Encoders.tuple(Encoders.STRING, Encoders.STRING,
        Encoders.scalaLong, Encoders.scalaLong, Encoders.STRING)
      runStreamed(s, d) { ds =>
        ds.map(e => (e.key, e.attribute, e.seqId, e.stamp,
          new String(e.value, "UTF-8")))
      }.select(col("_1").as("user_key"), col("_2").as("attr"),
        col("_3").as("event_id"), col("_4").as("stamp_us"),
        split(col("_5"), "\\|").getItem(0).cast("long").as("val_cents"),
        split(col("_5"), "\\|").getItem(1).as("event_type"))
    }),

    // stream(fromStamp) — the position=CURRENT approximation: a streaming
    // subscription that replays only elements at-or-after a stamp (the
    // file source always replays retained history; the stamp filter is
    // the documented lowering, CommitLogFamily.stream:121). The bound is
    // the last hour before the log's max stamp (one 1-row aggregate).
    "q_stream_from_stamp" -> ((s, d) => {
      import org.apache.spark.sql.Encoders
      implicit val oe = Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong)
      val fam = sharedEventLog(s, d)
      val maxUs = Tables.events(s, d)
        .agg(max(unix_micros(col("ts")))).head().getLong(0)
      StreamSupport.runToMemorySink(s,
        fam.stream(fromStamp = maxUs - 3600L * 1000000)
          .map(e => (e.seqId, e.stamp))
      )(_.processAllAvailable())
        .select(col("_1").as("event_id"), col("_2").as("stamp_us"))
    }),

    // throughput limiting (ThroughputLimiter.java:27 →
    // CommitLogFamily.streamFromOldestThrottled): the log staged as four
    // seqId-sliced segments with ordered mtimes; maxFilesPerTrigger=1
    // must admit exactly ONE segment per micro-batch, in mtime order.
    // The in-query require rejects a trigger that mixed segments; the
    // emitted (batch_id, slice, n_rows) rows then pin batch order ==
    // staging order and row preservation against the oracle (batch_id
    // == slice by construction)
    "q_throttled_replay" -> ((s, d) => {
      import s.implicits._
      val fam = throttleLog(s, d)
      val buf = collection.mutable.ArrayBuffer.empty[(Long, Long, Long)]
      val q = graft.streaming.StreamConf.scoped(
          fam.streamFromOldestThrottled(maxFilesPerTrigger = 1)) { ds =>
        ds.writeStream
        .foreachBatch { (b: Dataset[StreamElement], id: Long) =>
          val slices = b.toDF()
            .groupBy((col("seqId") % 4).as("slice"))
            .agg(count(lit(1)).as("n")).collect()
          buf.synchronized {
            slices.foreach(r => buf += ((id, r.getLong(0), r.getLong(1))))
          }
          ()
        }
        .start()
      }
      try q.processAllAvailable() finally q.stop()
      val rows = buf.synchronized(buf.toVector)
      require(rows.nonEmpty, "throttled replay produced no batches")
      require(rows.groupBy(_._1).values.forall(_.size == 1),
        s"a trigger admitted more than one segment: $rows")
      rows.toDF("batch_id", "slice", "n_rows")
    }),

    // watermark shift (WatermarkShift.java:43 / AssignEventTime.java:27):
    // every element's event time moved forward two minutes, id + shifted
    // stamp hash-matched
    "q_watermark_shift" -> ((s, d) => {
      graft.streaming.EventTimeWindows
        .shiftEventTime(Tables.eventsAsChangelog(s, d), byMs = 120000L)
        .select(col("seqId").as("event_id"), col("stamp").as("stamp_us"))
    }),

    // CachedView end-to-end: continuous maintenance (assign → snapshot
    // updates → local fold) over the shared commit log, then the view's
    // materialized snapshot must equal latest-per-(key, attribute)
    // (LocalCachedPartitionedView.java:59 — the read-write view random
    // access serves from). The snapshot dump is driver-side BY DESIGN:
    // the view IS a per-process cache (its scaladoc documents the
    // cluster-scale shape: each consumer assigns only its key range).
    "q_cached_view" -> ((s, d) => {
      import s.implicits._
      val fam = sharedEventLog(s, d)
      val ckpt = java.nio.file.Files.createTempDirectory("graft-cv-q").toString
      val view = new graft.streaming.CachedView(fam)
      try {
        view.assign(s"$ckpt/ckpt")
        view.processAllAvailable()
        view.snapshotContents
          .map(e => (e.key, e.attribute, {
            val v = new String(e.value, "UTF-8")
            v.substring(0, v.indexOf('|')).toLong
          }))
          .toDS()
          .select(col("_1").as("user_key"), col("_2").as("attr"),
            col("_3").as("val_cents"))
          .localCheckpoint(true)
      } finally {
        view.stop()
        StagedLogs.deleteRecursively(ckpt)
      }
    }),

    // groupReduce: whole-group UDF emitting N outputs (WindowedStream
    // .java:129) — here top-2 per event_type by value; lowered to a ranked
    // window (distributed, spill-safe) instead of materializing groups
    "q_group_reduce_top2" -> ((s, d) => {
      val w = Window.partitionBy(col("event_type"))
        .orderBy(col("value").desc, col("event_id"))
      Tables.events(s, d)
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 2)
        .select(col("event_type"), col("rk"), col("event_id"), col("value"))
    })
  )

  val oracles: Map[String, String] = Map(
    "q_integrate_per_key" ->
      """SELECT event_id, user_id,
        |CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) OVER (
        |  PARTITION BY user_id ORDER BY ts, event_id
        |  ROWS UNBOUNDED PRECEDING) AS BIGINT) AS run_cents
        |FROM events""".stripMargin,

    "q_reduce_value_state" ->
      """SELECT event_id, user_id,
        |coalesce(lag(event_type) OVER (
        |  PARTITION BY user_id ORDER BY ts, event_id), 'none') AS prev_type
        |FROM events""".stripMargin,

    "q_integrate_after_reduce_state" ->
      """WITH e AS (
        |  SELECT event_id, user_id, event_type, ts,
        |         CAST(round(value * 100, 0) AS BIGINT) AS v
        |  FROM events
        |), d AS (
        |  SELECT event_id, event_type, ts,
        |         v - coalesce(lag(v) OVER (
        |           PARTITION BY user_id ORDER BY ts, event_id), 0) AS diff
        |  FROM e
        |)
        |SELECT event_id, event_type,
        |       CAST(sum(diff) OVER (
        |         PARTITION BY event_type ORDER BY ts, event_id
        |         ROWS UNBOUNDED PRECEDING) AS BIGINT) AS run_diff
        |FROM d""".stripMargin,

    // closed-form replay of the early-emit timer machine over the
    // 4-segment log (3 data batches by event_id % 3 + the max-stamp
    // poke). Element panes = per-key fold ordinal in (batch, stamp, id)
    // order. Timer panes: with delay = max(earlyEmit=1d, disorder=60d)
    // the stamp-clock deadline of a cell last fed at batch b is
    // max(lastEventMs + 1d, wmAtArming + 1) and the watermark of batch
    // b' sits at maxMs(batches < b'); a quiet cell fires when deadline <
    // watermark (strict, LatenessProbeSpec-adjacent Spark contract).
    // fire1: quiet at batch 1 vs m0. fire2: quiet at batch 2 vs m01
    // (arming clamp m0+1 applies when last fed in batch 1). fire3: the
    // poke batch vs m (a cell that fired at batch 1 re-fires only if
    // batch-2 data re-armed it from an old stamp; a fired-and-idle cell
    // re-armed at wmFire + 1d can never fire again inside the span).
    "q_reduce_value_state_early" ->
      """WITH e AS (
        |  SELECT CAST(user_id AS VARCHAR) || ':' || CAST(event_id % 7 AS VARCHAR) AS user_key,
        |         event_id, epoch_us(ts) AS us,
        |         CAST(floor(epoch_us(ts) / 1000) AS BIGINT) AS ms,
        |         event_id % 3 AS b
        |  FROM events
        |), bm AS (
        |  SELECT max(ms) FILTER (WHERE b = 0) AS m0,
        |         max(ms) FILTER (WHERE b <= 1) AS m01,
        |         max(ms) AS m
        |  FROM e
        |), kb AS (
        |  SELECT user_key,
        |         bool_or(b = 0) AS p0, bool_or(b = 1) AS p1, bool_or(b = 2) AS p2,
        |         max(ms) FILTER (WHERE b = 0) AS cum0,
        |         max(ms) FILTER (WHERE b <= 1) AS cum1,
        |         max(ms) AS cum2,
        |         count(*) FILTER (WHERE b = 0) AS c0,
        |         count(*) FILTER (WHERE b <= 1) AS c01,
        |         count(*) AS c012
        |  FROM e GROUP BY user_key
        |), f AS (
        |  SELECT *,
        |    (p0 AND NOT p1 AND cum0 + 86400000 < (SELECT m0 FROM bm)) AS fire1
        |  FROM kb
        |), f2 AS (
        |  SELECT *,
        |    (NOT fire1 AND NOT p2 AND
        |     (CASE WHEN p1 THEN greatest(cum1 + 86400000, (SELECT m0 FROM bm) + 1)
        |           ELSE cum0 + 86400000 END) < (SELECT m01 FROM bm)) AS fire2
        |  FROM f
        |), f3 AS (
        |  SELECT *,
        |    (NOT fire2 AND NOT (fire1 AND NOT p2) AND
        |     (CASE WHEN p2 THEN greatest(cum2 + 86400000, (SELECT m01 FROM bm) + 1)
        |           WHEN p1 THEN greatest(cum1 + 86400000, (SELECT m0 FROM bm) + 1)
        |           ELSE cum0 + 86400000 END) < (SELECT m FROM bm)) AS fire3
        |  FROM f2
        |)
        |SELECT user_key, event_id,
        |       row_number() OVER (PARTITION BY user_key ORDER BY b, us, event_id) AS n
        |FROM e
        |UNION ALL
        |SELECT user_key, CAST(-1 AS BIGINT) AS event_id,
        |       CASE WHEN fire1 THEN c0 ELSE c01 END AS n
        |FROM f3 WHERE fire1 OR fire2
        |UNION ALL
        |SELECT user_key, CAST(-1 AS BIGINT) AS event_id, c012 AS n
        |FROM f3 WHERE fire3""".stripMargin,

    // the fold's output multiset per user is {1..n} in any order; any
    // total order reproduces the same multiset, and the compare sorts
    "q_reduce_value_state_unsorted" ->
      """SELECT user_id, row_number() OVER (
        |  PARTITION BY user_id ORDER BY event_id) AS ordinal
        |FROM events""".stripMargin,

    "q_integrate_per_key_stream" ->
      """SELECT CAST(user_id AS VARCHAR) AS user_key,
        |epoch_us(ts) AS stamp_us,
        |CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) OVER (
        |  PARTITION BY user_id ORDER BY ts, event_id
        |  ROWS UNBOUNDED PRECEDING) AS BIGINT) AS run_cents
        |FROM events""".stripMargin,

    "q_reduce_value_state_stream" ->
      """SELECT CAST(user_id AS VARCHAR) AS user_key, event_id,
        |coalesce(lag(event_type) OVER (
        |  PARTITION BY user_id ORDER BY ts, event_id), 'none') AS prev_type
        |FROM events""".stripMargin,

    "q_snapshot_updates_stream" ->
      """SELECT user_key, attr, val_cents FROM (
        |  SELECT CAST(user_id AS VARCHAR) AS user_key,
        |         'ev.' || CAST(event_id % 8 AS VARCHAR) AS attr,
        |         CAST(round(value * 100, 0) AS BIGINT) AS val_cents,
        |         row_number() OVER (PARTITION BY user_id, event_id % 8
        |           ORDER BY ts DESC, event_id DESC) AS rn
        |  FROM events
        |) WHERE rn = 1""".stripMargin,

    "q_stream_from_oldest" ->
      """SELECT CAST(user_id AS VARCHAR) AS user_key,
        |'ev.' || CAST(event_id % 8 AS VARCHAR) AS attr,
        |event_id, epoch_us(ts) AS stamp_us,
        |CAST(round(value * 100, 0) AS BIGINT) AS val_cents, event_type
        |FROM events""".stripMargin,

    "q_stream_from_stamp" ->
      """SELECT event_id, epoch_us(ts) AS stamp_us FROM events
        |WHERE epoch_us(ts) >= (SELECT max(epoch_us(ts)) FROM events) - 3600000000""".stripMargin,

    // batch_id == slice: segments staged in slice order, admitted one
    // per trigger in mtime order
    "q_throttled_replay" ->
      """SELECT CAST(event_id % 4 AS BIGINT) AS batch_id,
        |CAST(event_id % 4 AS BIGINT) AS slice,
        |count(*) AS n_rows
        |FROM events GROUP BY 1, 2""".stripMargin,

    "q_watermark_shift" ->
      """SELECT event_id, epoch_us(ts) + 120000000 AS stamp_us FROM events""".stripMargin,

    "q_cached_view" ->
      """SELECT user_key, attr, val_cents FROM (
        |  SELECT CAST(user_id AS VARCHAR) AS user_key,
        |         'ev.' || CAST(event_id % 8 AS VARCHAR) AS attr,
        |         CAST(round(value * 100, 0) AS BIGINT) AS val_cents,
        |         row_number() OVER (PARTITION BY user_id, event_id % 8
        |           ORDER BY ts DESC, event_id DESC) AS rn
        |  FROM events
        |) WHERE rn = 1""".stripMargin,

    "q_group_reduce_top2" ->
      """SELECT event_type, rk, event_id, value FROM (
        |  SELECT event_type, event_id, value,
        |         row_number() OVER (PARTITION BY event_type
        |           ORDER BY value DESC, event_id) AS rk
        |  FROM events
        |) WHERE rk <= 2""".stripMargin
  )
}
