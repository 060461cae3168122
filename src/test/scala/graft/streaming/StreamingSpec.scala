package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.StreamElement
import graft.randomaccess.RandomAccessReader

/** Streaming semantics spec — Structured Streaming analog of the
  * reference's commit-log observe / cached-view / transformation tests
  * (reference: direct/core tests over InMemStorage; GroovyEnvTest streaming
  * variants).
  */
class StreamingSpec extends SparkSpec {

  private def up(key: String, attr: String, stamp: Long, v: String,
      seq: Long = 0) =
    StreamElement("e", key, attr, s"u-$key-$attr-$stamp-$seq", seq, stamp,
      v.getBytes("UTF-8"), delete = false, deleteWildcard = false)

  private def delWc(key: String, prefix: String, stamp: Long) =
    StreamElement("e", key, prefix + "*", s"w-$key-$stamp", 0, stamp, null,
      delete = true, deleteWildcard = true)

  private def del(key: String, attr: String, stamp: Long) =
    StreamElement("e", key, attr, s"d-$key-$attr-$stamp", 0, stamp, null,
      delete = true, deleteWildcard = false)

  private def tmp(): String =
    Files.createTempDirectory("graft-test-").toString

  test("snapshotUpdates maintains latest-per-attribute across batches") {
    implicit val sq = spark.sqlContext
    implicit val enc = StreamElement.encoder
    val input = MemoryStream[StreamElement]
    val q = StateOps.snapshotUpdates(input.toDS())
      .writeStream.format("memory").queryName("snap1").outputMode("update")
      .start()
    try {
      input.addData(up("k", "a", 1, "v1"), up("k", "a", 5, "v2"))
      q.processAllAvailable()
      // out-of-order element in a later batch must NOT win
      input.addData(up("k", "a", 3, "stale"), up("k", "b", 1, "b1"))
      q.processAllAvailable()
      val rows = spark.sql("SELECT attribute, CAST(value AS STRING) v FROM snap1")
        .collect().map(r => (r.getString(0), r.getString(1)))
      // update-mode memory sink appends every change; latest per attribute:
      val latest = rows.groupBy(_._1).map { case (a, vs) => a -> vs.last._2 }
      assert(latest == Map("a" -> "v2", "b" -> "b1"))
      assert(!rows.map(_._2).contains("stale"))
    } finally q.stop()
  }

  test("snapshotUpdates honors wildcard-delete across batches") {
    implicit val sq = spark.sqlContext
    implicit val enc = StreamElement.encoder
    val input = MemoryStream[StreamElement]
    val q = StateOps.snapshotUpdates(input.toDS())
      .writeStream.format("memory").queryName("snap2").outputMode("update")
      .start()
    try {
      input.addData(up("k", "device.1", 1, "d1"), up("k", "device.2", 2, "d2"))
      q.processAllAvailable()
      input.addData(delWc("k", "device.", 5))
      q.processAllAvailable()
      input.addData(up("k", "device.3", 7, "d3"), up("k", "device.9", 4, "late"))
      q.processAllAvailable()
      val rows = spark.sql(
        "SELECT attribute, delete, CAST(value AS STRING) v FROM snap2").collect()
      // per attribute, last emission wins
      val last = rows.groupBy(_.getString(0))
        .map { case (a, rs) => a -> rs.last }
      assert(last("device.1").getBoolean(1))      // evicted
      assert(last("device.2").getBoolean(1))      // evicted
      assert(last("device.3").getString(2) == "d3") // survives (after wc)
      assert(!last.contains("device.9"))          // covered by wc, never emitted
    } finally q.stop()
  }

  test("commit log family roundtrip: append -> batchUpdates/batchSnapshot") {
    val fam = new CommitLogFamily(spark, tmp() + "/log")
    fam.append(Seq(up("k1", "a", 1, "x"), up("k1", "a", 9, "y"),
      up("k2", "a", 3, "z")))
    fam.append(Seq(up("k2", "a", 5, "z2")))
    assert(fam.batchUpdates().count() == 4)
    assert(fam.batchUpdates(from = 3, until = 9).count() == 2) // stamps 3,5
    val snap = fam.batchSnapshot().collect()
      .map(e => e.key -> new String(e.value, "UTF-8")).toMap
    assert(snap == Map("k1" -> "y", "k2" -> "z2"))
  }

  test("streamFromOldest replays the log through a streaming query") {
    val fam = new CommitLogFamily(spark, tmp() + "/log")
    fam.append(Seq(up("k", "a", 1, "v1"), up("k", "b", 2, "v2")))
    val q = fam.streamFromOldest()
      .writeStream.format("memory").queryName("replay").outputMode("append")
      .start()
    try {
      q.processAllAvailable()
      assert(spark.sql("SELECT * FROM replay").count() == 2)
      fam.append(Seq(up("k", "c", 3, "v3")))
      q.processAllAvailable()
      assert(spark.sql("SELECT * FROM replay").count() == 3)
    } finally q.stop()
  }

  test("cached view: partition-scoped assign materializes only its range") {
    val fam = new CommitLogFamily(spark, tmp() + "/log")
    fam.append(Seq(up("alpha", "status", 1, "a"), up("beta", "status", 2, "b"),
      up("zulu", "status", 3, "z")))
    // this process is assigned keys < "m"; the filter runs upstream of
    // the stateful operator and the collect, so "zulu" never reaches
    // this JVM's cache
    val view = new CachedView(fam)
      .assign(tmp() + "/ckpt", org.apache.spark.sql.functions.col("key") < "m")
    try {
      view.processAllAvailable()
      assert(view.get("alpha", "status").isDefined)
      assert(view.get("beta", "status").isDefined)
      assert(view.get("zulu", "status").isEmpty, "unassigned key must not be cached")
      assert(view.listEntities(0, 10) == Seq("alpha", "beta"))
    } finally view.stop()
    // hash-partition flavor: the four buckets cover the keyspace exactly
    val all = new CachedView(fam)
      .assignPartitions(tmp() + "/ckpt2", Set(0, 1, 2, 3), 4)
    try {
      all.processAllAvailable()
      assert(all.listEntities(0, 10) == Seq("alpha", "beta", "zulu"))
    } finally all.stop()
  }

  test("cached view: as-of read between an upsert and its wildcard tombstone") {
    val fam = new CommitLogFamily(spark, tmp() + "/log")
    fam.append(Seq(up("k", "device.1", 10, "d1")))
    val view = new CachedView(fam, maxVersions = 2).assign(tmp() + "/ckpt")
    try {
      view.processAllAvailable()
      // second batch: the tombstone arrives after the upsert pane is
      // cached (intra-batch, update-mode compaction would collapse the
      // pair to the delete alone — per-batch net change is the contract)
      fam.append(Seq(delWc("k", "device.", 18)))
      view.processAllAvailable()
      // the eviction delete must carry the TOMBSTONE's stamp (18), not
      // the dead upsert's (10): the cell was alive at 12
      assert(view.get("k", "device.1", 12).map(e => new String(e.value, "UTF-8"))
        .contains("d1"), "as-of read before the tombstone must see the upsert")
      assert(view.get("k", "device.1", 19).isEmpty,
        "as-of read after the tombstone must see the cell dead")
      assert(view.get("k", "device.1").isEmpty)
    } finally view.stop()
  }

  test("cached view: a cell retaining ONLY tombstones is dropped at any " +
      "maxVersions — deleted keys must not pin cache entries forever " +
      "under the default infinite keepDuration") {
    val fam = new CommitLogFamily(spark, tmp() + "/log")
    fam.append(Seq(up("k", "a", 10, "v1")))
    val view = new CachedView(fam, maxVersions = 2).assign(tmp() + "/ckpt")
    try {
      view.processAllAvailable()
      assert(view.versions("k", "a").nonEmpty)
      // two successive deletes: the retained window becomes
      // [tomb2, tomb1] — every read answers None, so the cell is pure
      // leak if kept (the old head-only check removed it only at
      // maxVersions = 1)
      fam.append(Seq(del("k", "a", 20)))
      view.processAllAvailable()
      fam.append(Seq(del("k", "a", 30)))
      view.processAllAvailable()
      assert(view.versions("k", "a").isEmpty,
        s"all-tombstone cell must be dropped: ${view.versions("k", "a")}")
      assert(view.listEntities(0, 10).isEmpty)
    } finally view.stop()
  }

  test("cached view: get/scanWildcard/listEntities + write-through") {
    val fam = new CommitLogFamily(spark, tmp() + "/log")
    fam.append(Seq(up("u1", "device.1", 1, "d1"), up("u1", "device.2", 2, "d2"),
      up("u2", "status", 1, "ok")))
    val view = new CachedView(fam).assign(tmp() + "/ckpt")
    try {
      view.processAllAvailable()
      assert(view.get("u2", "status").map(e => new String(e.value, "UTF-8"))
        .contains("ok"))
      assert(view.scanWildcard("u1", "device.").map(_.attribute) ==
        Seq("device.1", "device.2"))
      assert(view.listEntities(0, 10) == Seq("u1", "u2"))
      // write-through + wildcard delete
      view.write(delWc("u1", "device.", 5))
      view.processAllAvailable()
      assert(view.scanWildcard("u1", "device.").isEmpty)
      assert(view.get("u2", "status").nonEmpty)
    } finally view.stop()
  }

  test("transformation: event -> derived wildcard history (EventDataToUserHistory)") {
    val source = new CommitLogFamily(spark, tmp() + "/src")
    val target = new CommitLogFamily(spark, tmp() + "/dst")
    // event.data -> user.event.<stamp> (reference example reference.conf:155)
    val t: Transformations.ElementWise = (e: StreamElement) =>
      Seq(e.copy(entity = "user", attribute = s"event.${e.stamp}"))
    source.append(Seq(up("userA", "data", 100, "ev1"), up("userA", "data", 200, "ev2")))
    val q = Transformations.run(source, target, t, tmp() + "/ckpt")
    try {
      q.processAllAvailable()
      val derived = target.batchUpdates().collect()
      assert(derived.map(_.attribute).sorted.toSeq == Seq("event.100", "event.200"))
      assert(derived.forall(_.entity == "user"))
    } finally q.stop()
  }

  test("streaming integratePerKey accumulates across batches in stamp order") {
    implicit val sq = spark.sqlContext
    implicit val enc = StreamElement.encoder
    val input = MemoryStream[StreamElement]
    val q = StateOps.integratePerKey(input.toDS(), 0.0,
        e => new String(e.value, "UTF-8").toDouble, _ + _)
      .toDF("key", "stamp", "running")
      .writeStream.format("memory").queryName("integ").outputMode("update")
      .start()
    try {
      input.addData(up("k", "v", 2, "10"), up("k", "v", 1, "1", seq = 1))
      q.processAllAvailable()
      input.addData(up("k", "v", 3, "100"))
      q.processAllAvailable()
      val runs = spark.sql("SELECT running FROM integ ORDER BY stamp")
        .collect().map(_.getDouble(0)).toSeq
      assert(runs == Seq(1.0, 11.0, 111.0))
    } finally q.stop()
  }

  test("random access reader over the family") {
    val fam = new CommitLogFamily(spark, tmp() + "/log")
    fam.append(Seq(up("u1", "device.1", 1, "d1"), up("u1", "device.2", 5, "d2"),
      up("u1", "status", 2, "on"), up("u2", "status", 3, "off")))
    val ra = new RandomAccessReader(fam)
    assert(ra.get("u1", "status").map(e => new String(e.value, "UTF-8"))
      .contains("on"))
    assert(ra.get("u1", "device.2", stamp = 3).isEmpty) // not yet written at 3
    assert(ra.multiFetch(Seq("u1", "u2"), "status").keySet == Set("u1", "u2"))
    assert(ra.scanWildcard("u1", "device.").map(_.attribute) ==
      Seq("device.1", "device.2"))
    assert(ra.scanWildcardAll("u1").size == 3)
    assert(ra.listEntities(0, 5) == Seq("u1", "u2"))
    assert(ra.listEntities(1, 5) == Seq("u2"))
  }

  test("appendIdempotent drops replayed uuids, keeps fresh ones") {
    val fam = new CommitLogFamily(spark, tmp() + "/log")
    val batch1 = Seq(up("k1", "a", 1, "x"), up("k2", "a", 2, "y"))
    fam.appendIdempotent(spark.createDataset(batch1)(StreamElement.encoder))
    assert(fam.batchUpdates().count() == 2)
    // replay of the exact same micro-batch: no duplicates appended
    fam.appendIdempotent(spark.createDataset(batch1)(StreamElement.encoder))
    assert(fam.batchUpdates().count() == 2)
    // a mixed batch: replayed element skipped, new element lands
    val batch2 = Seq(batch1.head, up("k3", "a", 3, "z"))
    fam.appendIdempotent(spark.createDataset(batch2)(StreamElement.encoder))
    val all = fam.batchUpdates().collect()
    assert(all.length == 3)
    assert(all.map(_.uuid).distinct.length == 3)
  }

  test("versioned cached view bounds memory via maxVersions and TTL") {
    val fam = new CommitLogFamily(spark, tmp() + "/log")
    fam.append(Seq(up("u1", "status", 100, "v1")))
    val view = new CachedView(fam, maxVersions = 2, keepDurationMs = 50)
      .assign(tmp() + "/ckpt")
    try {
      view.processAllAvailable()
      // five successive versions -> only the newest two retained
      fam.append(Seq(up("u1", "status", 110, "v2")))
      view.processAllAvailable()
      fam.append(Seq(up("u1", "status", 120, "v3")))
      view.processAllAvailable()
      fam.append(Seq(up("u1", "status", 130, "v4")))
      view.processAllAvailable()
      assert(view.versions("u1", "status").size <= 2)
      assert(view.get("u1", "status").map(e => new String(e.value, "UTF-8"))
        .contains("v4"))
      // as-of read over retained versions
      assert(view.get("u1", "status", stamp = 125)
        .map(e => new String(e.value, "UTF-8")).contains("v3"))
      // TTL: advancing the clock past keepDurationMs evicts old versions
      fam.append(Seq(up("u2", "status", 300, "fresh")))
      view.processAllAvailable()
      assert(view.versions("u1", "status").isEmpty,
        "versions 170ms older than the newest stamp must age out")
      assert(view.get("u2", "status").nonEmpty)
    } finally view.stop()
  }

  test("point reads honor wildcard-delete tombstones") {
    val fam = new CommitLogFamily(spark, tmp() + "/log")
    fam.append(Seq(up("u1", "device.1", 1, "d1"), up("u1", "device.2", 2, "d2"),
      up("u2", "device.1", 3, "other"), up("u1", "status", 4, "on")))
    fam.append(Seq(delWc("u1", "device.", 5)))
    val ra = new RandomAccessReader(fam)
    // get() of a wildcard suffix must see the covering tombstone
    assert(ra.get("u1", "device.1").isEmpty)
    assert(ra.get("u1", "device.2").isEmpty)
    // as-of read BEFORE the tombstone still sees the value
    assert(ra.get("u1", "device.1", stamp = 4).nonEmpty)
    // a write AFTER the tombstone survives it
    fam.append(Seq(up("u1", "device.1", 7, "revived")))
    assert(ra.get("u1", "device.1").map(e => new String(e.value, "UTF-8"))
      .contains("revived"))
    // other keys / scalar attributes untouched
    assert(ra.get("u2", "device.1").nonEmpty)
    assert(ra.get("u1", "status").nonEmpty)
    // multiFetch honors the tombstone per key
    assert(ra.multiFetch(Seq("u1", "u2"), "device.2").keySet == Set.empty)
    assert(ra.multiFetch(Seq("u1", "u2"), "device.1").keySet == Set("u1", "u2"))
    // deeper-than-root scanWildcard prefix still sees the device.* tombstone
    fam.append(Seq(up("u3", "device.ab1", 1, "x"), up("u3", "device.ab2", 2, "y")))
    fam.append(Seq(delWc("u3", "device.", 9)))
    assert(ra.scanWildcard("u3", "device.ab").isEmpty)
  }

  test("console-style bounded collect on an unbounded stream") {
    val fam = new CommitLogFamily(spark, tmp() + "/log")
    fam.append(Seq(up("k1", "a", 1, "x"), up("k2", "a", 2, "y"),
      up("k3", "a", 3, "z")))
    // limit reached -> returns without consuming the whole (endless) stream
    val two = StreamCollector.collect(fam.streamFromOldest(), limit = 2)
    assert(two.size == 2)
    // timeout path: ask for more rows than exist
    val all = StreamCollector.collect(fam.streamFromOldest(), limit = 10,
      timeoutMs = 3000)
    assert(all.size == 3)
  }

  test("proxy attribute read/write views") {
    val t = graft.core.ElementWiseProxyTransform.renaming("proxied.", "raw.")
    val w = up("k", "proxied.x", 1, "v").copy(
      attribute = t.fromProxy("proxied.x"))
    assert(w.attribute == "raw.x")
    assert(t.toProxy(w.attribute) == "proxied.x")
  }
}
