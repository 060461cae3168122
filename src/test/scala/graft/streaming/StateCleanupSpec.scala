package graft.streaming

import scala.concurrent.duration._

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec
import graft.core.StreamElement

/** Timeout-based keyed-state cleanup and early emission — the Spark
  * lowerings of the reference's EVENT-TIME state timers (reference:
  * beam/core/.../retract/RetractJoin.java:195-213 cleanup timer setup,
  * :349-371 onTimer eviction; BeamStream.java:1596-1622
  * AbstractReduceValueStateByKey early-emitting timer,
  * TimerSpecs.timer(TimeDomain.EVENT_TIME)).
  *
  * Everything here is WATERMARK-driven, no wall-clock sleeps: elements
  * carry millisecond stamps, the operators attach their own
  * horizon-delayed watermark riding the stamp (watermark = max stamp −
  * cleanup, so "idle a full horizon" reads as watermark ≥ last event
  * time), and timers fire as later elements advance it. Two Spark facts
  * shape the tests: the watermark is computed at
  * batch END (a timer set against batch N's data can only fire from
  * batch N+1 on), and `processAllAvailable` does not wait for data-less
  * timer-only batches — so each expected firing is driven by a "poke"
  * batch on an unrelated key, which advances nothing for the key under
  * test but guarantees the expired timer is serviced before the next
  * assertion.
  */
class StateCleanupSpec extends SparkSpec {

  private def el(key: String, stamp: Long, v: String, seq: Long = 0) =
    StreamElement("e", key, "a", s"$key-$stamp-$seq", seq, stamp,
      v.getBytes("UTF-8"), delete = false, deleteWildcard = false)

  private def del(key: String, attr: String, stamp: Long, v: String,
      isDel: Boolean) =
    StreamElement("e", key, attr, s"$key-$attr-$stamp", 0, stamp,
      if (v == null) null else v.getBytes("UTF-8"), delete = isDel,
      deleteWildcard = false)

  private def str(b: Array[Byte]): String =
    if (b == null) null else new String(b, "UTF-8")

  private implicit val changeEnc: org.apache.spark.sql.Encoder[RetractJoin.Change] =
    org.apache.spark.sql.Encoders.product[RetractJoin.Change]

  test("retract join: idle join key evicted after cleanup, rebuilt by later elements") {
    implicit val sq = spark.sqlContext
    implicit val enc = StreamElement.encoder
    val left = MemoryStream[StreamElement]
    val right = MemoryStream[StreamElement]
    val changes = RetractJoin(
      left.toDS(), e => if (e.key.startsWith("x")) "OTHER" else "J",
      right.toDS(), _ => "J",
      cleanup = Some(5000.millis), stampUnit = "millis")
    val q = changes.writeStream.format("memory").queryName("rj_ttl")
      .outputMode("update").start()
    try {
      def byKey = spark.sql("SELECT * FROM rj_ttl WHERE joinKey = 'J'")
        .as[RetractJoin.Change].collect().sortBy(_.seq)

      left.addData(el("L1", 10000, "a"))
      right.addData(el("R1", 11000, "b"))
      q.processAllAvailable()
      assert(byKey.length == 1 && byKey.head.isAddition)

      // an unrelated-key element pushes the horizon-lagged watermark
      // (max stamp − 5000) past J's last event time (11000); the poke
      // batch then services the expired timer: J's whole cell is evicted
      // — and eviction emits NO retraction of (L1, R1): data older than
      // the cleanup horizon is no longer retractable
      left.addData(el("xpoke", 20000, "p"))
      q.processAllAvailable()
      left.addData(el("xpoke", 20001, "p2"))
      q.processAllAvailable()
      assert(byKey.length == 1, s"eviction must not emit changes: ${byKey.toList}")

      // rebuild: R2+L2 arrive into the evicted (empty) cell in one batch —
      // R1 is gone, so the only pair is (L2, R2), built from scratch
      right.addData(el("R2", 21000, "c"))
      left.addData(el("L2", 22000, "d"))
      q.processAllAvailable()
      val after = byKey
      assert(after.length == 2)
      val rebuilt = after.last
      assert(rebuilt.isAddition && rebuilt.leftKey == "L2" &&
        rebuilt.rightKey == "R2" && str(rebuilt.leftValue) == "d")
      // seq restarted from 0 — the reference clears the seq state too
      // (RetractJoin.java:361-366)
      assert(rebuilt.seq == 0L,
        s"seq must restart after eviction, got ${rebuilt.seq}")
      assert(after.count(!_.isAddition) == 0)
    } finally q.stop()
  }

  test("retract join: hot join key evicts stale ENTRIES past the horizon " +
      "while fresh entries and the seq counter survive") {
    // the reference's entry-level horizon (RetractJoin.java:349-371): a
    // never-idle join key must still drop individual entries older than
    // the cleanup window — without the full-cell clear (seq keeps
    // counting) and without retracting the expired pairs
    implicit val sq = spark.sqlContext
    implicit val enc = StreamElement.encoder
    val left = MemoryStream[StreamElement]
    val right = MemoryStream[StreamElement]
    val changes = RetractJoin(
      left.toDS(), _ => "J", right.toDS(), _ => "J",
      cleanup = Some(5000.millis), stampUnit = "millis")
    val q = changes.writeStream.format("memory").queryName("rj_entry_ttl")
      .outputMode("update").start()
    try {
      def rows = spark.sql("SELECT * FROM rj_entry_ttl")
        .as[RetractJoin.Change].collect().sortBy(_.seq)

      left.addData(el("L1", 10000, "a")) // the entry that will go stale
      q.processAllAvailable()
      left.addData(el("L2", 14000, "b")) // stays fresh via updates
      right.addData(el("R0", 14200, "r0"))
      q.processAllAvailable()
      // R0 paired with BOTH live left entries
      assert(rows.length == 2 && rows.forall(_.isAddition))

      left.addData(el("L2", 19000, "b2")) // keeps the cell hot
      q.processAllAvailable()             // wm now 9200: L1 still in
      assert(rows.length == 4)            // retract+add of (L2, R0)

      // wm at next batch start = 14000: L1@10000 falls past the horizon
      // and is evicted ON UPDATE (cell active, timer never fires);
      // R0@14200 survives, so L2's refresh still retracts+adds against it
      left.addData(el("L2", 24000, "b3"))
      q.processAllAvailable()
      assert(rows.length == 6, s"cell must stay live: ${rows.toList}")

      // wm 19000 evicts R0; the new right element pairs ONLY with L2 —
      // L1 is gone despite the key never idling
      right.addData(el("R1", 24500, "r"))
      q.processAllAvailable()
      val all = rows
      assert(all.length == 7, s"got ${all.toList}")
      val last = all.last
      assert(last.isAddition && last.leftKey == "L2" && last.rightKey == "R1"
        && str(last.leftValue) == "b3")
      assert(!all.exists(c => c.leftKey == "L1" && c.rightKey == "R1"),
        "stale L1 must not pair after per-entry eviction")
      // seq never reset: per-entry eviction is not the full-cell clear
      assert(all.map(_.seq).toSeq == (0L to 6L),
        s"seq must be continuous 0..6, got ${all.map(_.seq).toSeq}")
    } finally q.stop()
  }

  test("retract join without cleanup keeps idle state across watermark advance") {
    implicit val sq = spark.sqlContext
    implicit val enc = StreamElement.encoder
    val left = MemoryStream[StreamElement]
    val right = MemoryStream[StreamElement]
    val changes = RetractJoin(left.toDS(), _ => "J", right.toDS(), _ => "J")
    val q = changes.writeStream.format("memory").queryName("rj_nottl")
      .outputMode("update").start()
    try {
      left.addData(el("L1", 1000, "a"))
      q.processAllAvailable()
      right.addData(el("R1", 99999999L, "b"))
      q.processAllAvailable()
      val c = spark.sql("SELECT * FROM rj_nottl").as[RetractJoin.Change].collect()
      assert(c.length == 1 && c.head.leftKey == "L1" && c.head.rightKey == "R1")
    } finally q.stop()
  }

  test("integratePerKey: idle key evicted, restarts from initial; changelog correct") {
    implicit val sq = spark.sqlContext
    implicit val enc = StreamElement.encoder
    val input = MemoryStream[StreamElement]
    val q = StateOps.integratePerKey(input.toDS(), 0.0,
        e => new String(e.value, "UTF-8").toDouble, _ + _,
        cleanup = Some(5000.millis), stampUnit = "millis")
      .toDF("key", "stamp", "running")
      .writeStream.format("memory").queryName("integ_ttl")
      .outputMode("update").start()
    try {
      input.addData(el("k", 10000, "10"))
      q.processAllAvailable()
      // unrelated key pushes the lagged watermark (20000 − 5000) past
      // k's last event time (10000)...
      input.addData(el("other", 20000, "1"))
      q.processAllAvailable()
      // ...and the poke batch services the expired timer: k is evicted
      input.addData(el("other", 20500, "1"))
      q.processAllAvailable()
      input.addData(el("k", 30000, "7"))
      q.processAllAvailable()
      val runs = spark.sql("SELECT running FROM integ_ttl WHERE key='k' ORDER BY stamp")
        .collect().map(_.getDouble(0)).toSeq
      assert(runs == Seq(10.0, 7.0),
        s"evicted key must restart from initial, got $runs")
    } finally q.stop()
  }

  test("integratePerKey: a key active within each cleanup window keeps its state") {
    implicit val sq = spark.sqlContext
    implicit val enc = StreamElement.encoder
    val input = MemoryStream[StreamElement]
    val q = StateOps.integratePerKey(input.toDS(), 0.0,
        e => new String(e.value, "UTF-8").toDouble, _ + _,
        cleanup = Some(5000.millis), stampUnit = "millis")
      .toDF("key", "stamp", "running")
      .writeStream.format("memory").queryName("integ_live")
      .outputMode("update").start()
    try {
      // every arrival (k's own and the unrelated key's) keeps the
      // watermark short of k's current deadline (lastEvent + 5000), so
      // the timer never resolves as an eviction and the accumulator
      // carries across batches — watermark advance alone must not evict
      // an active key
      input.addData(el("k", 10000, "10"))
      q.processAllAvailable()
      input.addData(el("other", 13000, "1"))
      q.processAllAvailable()
      input.addData(el("k", 14000, "5"))
      q.processAllAvailable()
      input.addData(el("other", 17000, "1"))
      q.processAllAvailable()
      input.addData(el("k", 18000, "2"))
      q.processAllAvailable()
      val runs = spark.sql("SELECT running FROM integ_live WHERE key='k' ORDER BY stamp")
        .collect().map(_.getDouble(0)).toSeq
      assert(runs == Seq(10.0, 15.0, 17.0), s"active key must keep state: $runs")
    } finally q.stop()
  }

  test("cleanup bounds state under key churn; NoTimeout grows with every key ever seen") {
    implicit val sq = spark.sqlContext
    implicit val enc = StreamElement.encoder

    // 24 waves of 5 fresh keys each, 1s apart: at any instant only the
    // keys of the last ~3 waves are inside a 3s cleanup window
    def waves: Seq[StreamElement] =
      (0 until 24).flatMap(w => (0 until 5).map(i =>
        el(s"w$w-k$i", 10000L + w * 1000L, "1")))

    def run(cleanup: Option[scala.concurrent.duration.FiniteDuration],
        name: String): Long = {
      val input = MemoryStream[StreamElement]
      val q = StateOps.integratePerKey(input.toDS(), 0.0,
          e => new String(e.value, "UTF-8").toDouble, _ + _,
          cleanup = cleanup, stampUnit = "millis")
        .toDF("key", "stamp", "running")
        .writeStream.format("memory").queryName(name)
        .outputMode("update").start()
      try {
        waves.grouped(5).foreach { batch =>
          input.addData(batch)
          q.processAllAvailable()
        }
        // final poke so the last expired timers are serviced
        input.addData(el("poke", 60000L, "1"))
        q.processAllAvailable()
        input.addData(el("poke2", 60001L, "1"))
        q.processAllAvailable()
        q.recentProgress.flatMap(_.stateOperators.map(_.numRowsTotal)).last
      } finally q.stop()
    }

    val unbounded = run(None, "churn_nottl")
    val bounded = run(Some(3000.millis), "churn_ttl")
    // every wave's keys stay resident without cleanup
    assert(unbounded >= 120, s"NoTimeout keeps all cells, got $unbounded")
    // with a 3s horizon only the last waves (+ pokes) survive — the bound
    // a 100 TB long-running query needs: state ∝ keys active in the
    // window, not keys ever seen
    assert(bounded <= 30, s"cleanup must bound resident state, got $bounded")
  }

  test("snapshotUpdates: idle cell evicted from the state store; output stays correct") {
    implicit val sq = spark.sqlContext
    implicit val enc = StreamElement.encoder
    val input = MemoryStream[StreamElement]
    val q = StateOps.snapshotUpdates(input.toDS(),
        cleanup = Some(5000.millis), stampUnit = "millis")
      .writeStream.format("memory").queryName("snap_ttl")
      .outputMode("update").start()
    try {
      def outs(key: String) = spark.sql(
        s"SELECT value, delete FROM snap_ttl WHERE key='$key'").collect()
      input.addData(el("K", 10000, "v1"))
      q.processAllAvailable()
      assert(outs("K").length == 1, "winner emitted")
      // an older element within the window loses to the held winner: no
      // emission while the cell is alive
      input.addData(el("K", 9500, "v0"))
      q.processAllAvailable()
      assert(outs("K").length == 1, "stale element must not re-emit")
      // push the lagged watermark (max stamp − 5000) past K's last event
      // time; the poke batch services the eviction
      input.addData(el("other", 20000, "w"))
      q.processAllAvailable()
      input.addData(el("other", 20500, "x"))
      q.processAllAvailable()
      // eviction emits nothing (no spurious deletes) but drops the state
      // row — visible in the operator metrics
      assert(outs("K").length == 1, "eviction must not emit")
      val removed = q.recentProgress.flatMap(_.stateOperators.map(_.numRowsRemoved)).sum
      assert(removed >= 1, s"state rows must actually be removed, got $removed")
      // a fresh element within the new window claims the cell from scratch
      input.addData(el("K", 21000, "v2"))
      q.processAllAvailable()
      val ks = outs("K")
      assert(ks.length == 2 && !ks.last.getBoolean(1) &&
        new String(ks.last.getAs[Array[Byte]](0), "UTF-8") == "v2")
      // the horizon closes the stale-resurrection hole by construction:
      // an element older than an evicted winner is necessarily behind the
      // late-events watermark and is dropped before the operator, so it
      // can never re-emerge as a winner
      input.addData(el("K", 9000, "ghost"))
      q.processAllAvailable()
      assert(outs("K").length == 2, "behind-horizon element must be dropped")
    } finally q.stop()
  }

  test("snapshotUpdates: scalar tombstones a full watermark behind are " +
      "pruned from per-cell state WITHOUT changing semantics — a " +
      "behind-horizon re-offer of the dead suffix stays dead, a fresh " +
      "write wins") {
    implicit val sq = spark.sqlContext
    implicit val enc = StreamElement.encoder
    val input = MemoryStream[StreamElement]
    val q = StateOps.snapshotUpdates(input.toDS(),
        cleanup = Some(5000.millis), stampUnit = "millis")
      .writeStream.format("memory").queryName("snap_tomb")
      .outputMode("update").start()
    try {
      def outs(attr: String) = spark.sql(
        s"SELECT value, delete FROM snap_tomb WHERE attribute='$attr'")
        .collect()
      // the key stays HOT (its own traffic keeps it from whole-cell
      // eviction) while one suffix is written then deleted — separate
      // batches, or update-mode per-batch compaction emits only the net
      input.addData(del("K", "device.a", 10000, "v1", isDel = false))
      q.processAllAvailable()
      input.addData(del("K", "device.a", 11000, null, isDel = true))
      q.processAllAvailable()
      assert(outs("device.a").length == 2 &&
        outs("device.a").last.getBoolean(1), "delete emitted")
      // watermark (max − 5000) climbs far past the tombstone's 11000
      // via continued traffic on OTHER suffixes of the same key — the
      // tombstone is now uncontradictable and pruned from st.latest
      input.addData(del("K", "device.live", 30000, "w", isDel = false))
      q.processAllAvailable()
      input.addData(del("K", "device.live2", 31000, "x", isDel = false))
      q.processAllAvailable()
      // behind-horizon re-offer of the dead suffix: late-filtered before
      // the operator — dead stays dead, with or without the tombstone
      input.addData(del("K", "device.a", 10500, "ghost", isDel = false))
      q.processAllAvailable()
      assert(outs("device.a").length == 2,
        "behind-horizon re-offer must not resurrect the dead suffix")
      // a FRESH write on the suffix wins normally
      input.addData(del("K", "device.a", 32000, "v2", isDel = false))
      q.processAllAvailable()
      val rows = outs("device.a")
      assert(rows.length == 3 && !rows.last.getBoolean(1) &&
        new String(rows.last.getAs[Array[Byte]](0), "UTF-8") == "v2")
    } finally q.stop()
  }

  test("reduceValueStateByKey: early-emit timer re-emits output(state, null) for a quiet key") {
    implicit val sq = spark.sqlContext
    implicit val enc = StreamElement.encoder
    implicit val oe = org.apache.spark.sql.Encoders.tuple(
      org.apache.spark.sql.Encoders.STRING, org.apache.spark.sql.Encoders.STRING)
    implicit val se = org.apache.spark.sql.Encoders.STRING
    val input = MemoryStream[StreamElement]
    // output distinguishes the timer call (null element) from arrivals —
    // exactly the reference's onTimer `output.call(state, null)`
    // (BeamStream.java:1615)
    val out = StateOps.reduceValueStateByKey[String, String](
      input.toDS(), "init",
      (st, e) => if (e == null) s"timer:$st" else s"elem:$st",
      (st, e) => new String(e.value, "UTF-8"),
      earlyEmit = Some(5000.millis), stampUnit = "millis")
    val q = out.toDF("key", "o")
      .writeStream.format("memory").queryName("early")
      .outputMode("update").start()
    try {
      def rows(like: String) = spark.sql(
        s"SELECT o FROM early WHERE key='k' AND o LIKE '$like'")
        .collect().map(_.getString(0)).toSeq
      input.addData(el("k", 10000, "v1"))
      q.processAllAvailable()
      // quiet key + max stamp a full interval past k's last emission ->
      // timer re-emission (the second poke guarantees the expired timer
      // is serviced)
      input.addData(el("other", 20000, "x"))
      q.processAllAvailable()
      input.addData(el("other", 20002, "y"))
      q.processAllAvailable()
      assert(rows("timer:%").nonEmpty, "quiet key must re-emit on the timer")
      // the timer saw the post-update state and did NOT change it
      assert(rows("timer:%").forall(_ == "timer:v1"), rows("timer:%").toList)
      input.addData(el("k", 40000, "v2"))
      q.processAllAvailable()
      assert(rows("elem:%") == Seq("elem:init", "elem:v1"),
        "arrival outputs must fold across timer emissions unchanged")
    } finally q.stop()
  }

  test("reduceValueStateByKey: earlyEmit + cleanup — quiet key re-emits, idle key evicts") {
    implicit val sq = spark.sqlContext
    implicit val enc = StreamElement.encoder
    implicit val oe = org.apache.spark.sql.Encoders.tuple(
      org.apache.spark.sql.Encoders.STRING, org.apache.spark.sql.Encoders.STRING)
    implicit val se = org.apache.spark.sql.Encoders.STRING
    val input = MemoryStream[StreamElement]
    val out = StateOps.reduceValueStateByKey[String, String](
      input.toDS(), "init",
      (st, e) => if (e == null) s"timer:$st" else s"elem:$st",
      (st, e) => new String(e.value, "UTF-8"),
      cleanup = Some(10000.millis),
      earlyEmit = Some(2000.millis), stampUnit = "millis")
    val q = out.toDF("key", "o")
      .writeStream.format("memory").queryName("early_ttl")
      .outputMode("update").start()
    try {
      def rows(like: String) = spark.sql(
        s"SELECT o FROM early_ttl WHERE key='k' AND o LIKE '$like'")
        .collect().map(_.getString(0)).toSeq
      input.addData(el("k", 10000, "v1"))
      q.processAllAvailable()
      // inside the cleanup window: max stamp 13000 passes k's next
      // emission (10000 + 2000) but the lagged watermark (3000) is far
      // short of k's last event time — the poke batch services the timer
      // as an early emission, not an eviction
      input.addData(el("other", 13000, "w"))
      q.processAllAvailable()
      input.addData(el("other", 13500, "x"))
      q.processAllAvailable()
      assert(rows("timer:%").nonEmpty, "early emission inside cleanup window")
      assert(rows("timer:%").forall(_ == "timer:v1"), rows("timer:%").toList)
      // push the watermark a full cleanup interval past k's last arrival:
      // now the timer resolves as an eviction, so the next k element
      // folds from the initial state again
      input.addData(el("other", 30000, "y"))
      q.processAllAvailable()
      input.addData(el("other", 30100, "z"))
      q.processAllAvailable()
      input.addData(el("k", 31000, "v9"))
      q.processAllAvailable()
      assert(rows("elem:%").count(_ == "elem:init") == 2,
        s"idle ≥ cleanup must evict: ${rows("elem:%").toList}")
    } finally q.stop()
  }
}
