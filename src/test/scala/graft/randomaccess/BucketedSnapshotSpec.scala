package graft.randomaccess

import java.nio.file.Files

import graft.SparkSpec
import graft.core.StreamElement
import graft.operators.LatestWithTombstones

class BucketedSnapshotSpec extends SparkSpec {

  private def up(key: String, attr: String, stamp: Long, v: String) =
    StreamElement("e", key, attr, s"u-$key-$attr-$stamp", 0, stamp,
      v.getBytes("UTF-8"), delete = false, deleteWildcard = false)

  private def del(key: String, attr: String, stamp: Long) =
    StreamElement("e", key, attr, s"d-$key-$attr-$stamp", 0, stamp,
      null, delete = true, deleteWildcard = false)

  private def log(xs: Seq[StreamElement]) =
    spark.createDataset(xs)(StreamElement.encoder)

  private def store(b: Int = 8) = new BucketedSnapshotStore(spark,
    Files.createTempDirectory("graft-bss-").toString + "/store", buckets = b)

  private val hist = (1 to 50).map(i => up(s"k$i", "status", i.toLong, s"v$i"))

  test("get/multiFetch/scan read back the compacted snapshot") {
    val s = store()
    s.write(LatestWithTombstones.snapshot(log(
      hist ++ Seq(up("k7", "status", 100, "newer"), up("k7", "extra", 101, "x")))))
    assert(s.get("k7", "status").map(e => new String(e.value)) == Some("newer"))
    assert(s.get("missing", "status").isEmpty)
    assert(s.multiFetch(Seq("k1", "k2", "missing"), "status")
      .view.mapValues(e => new String(e.value)).toMap ==
      Map("k1" -> "v1", "k2" -> "v2"))
    assert(s.scan("k7").map(_.attribute) == Seq("extra", "status"))
  }

  test("point lookup prunes to one bucket directory (PartitionFilters)") {
    import org.apache.spark.sql.functions.col
    val s = store()
    s.write(LatestWithTombstones.snapshot(log(hist)))
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      // the exact read get() performs
      val df = spark.read.parquet(s.path)
        .filter(col("kb") === s.bucketOf("k13") && col("key") === "k13" &&
          col("attribute") === "status")
      df.collect()
      val plan = df.queryExecution.executedPlan
      assert(plan.toString.contains("PartitionFilters") &&
        plan.toString.contains("kb"), plan.toString.take(1500))
      val scan = plan.collect {
        case sc: org.apache.spark.sql.execution.FileSourceScanExec => sc
      }.head
      val touched = scan.metrics("numFiles").value
      val total = spark.read.parquet(s.path).inputFiles.length
      assert(touched < total,
        s"bucket pruning must skip files: $touched/$total")
    } finally spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
  }

  test("refresh rewrites only affected buckets and matches full compaction") {
    val s = store()
    s.write(LatestWithTombstones.snapshot(log(hist)))
    val delta = Seq(up("k3", "status", 200, "fresh"), del("k5", "status", 201),
      up("k99", "status", 202, "new-key"))
    s.refresh(log(delta))

    val got = s.snapshot().collect()
      .map(e => (e.key, e.attribute) -> new String(e.value)).toMap
    val full = LatestWithTombstones.snapshot(log(hist ++ delta)).collect()
      .map(e => (e.key, e.attribute) -> new String(e.value)).toMap
    assert(got == full)
    assert(got(("k3", "status")) == "fresh")
    assert(!got.contains(("k5", "status")))
    assert(got(("k99", "status")) == "new-key")
  }

  test("refresh leaves untouched bucket files physically unmodified") {
    val s = store(b = 16)
    s.write(LatestWithTombstones.snapshot(log(hist)))
    val dir = s.snapshot().inputFiles.map(f =>
      f.substring(0, f.lastIndexOf('/'))).distinct
    val before = s.snapshot().inputFiles.toSet
    val deltaKey = "k1"
    s.refresh(log(Seq(up(deltaKey, "status", 300, "touched"))))
    val after = s.snapshot().inputFiles.toSet
    val touchedDir = s"kb=${s.bucketOf(deltaKey)}"
    val (changedB, keptB) = before.partition(_.contains(touchedDir))
    val (changedA, keptA) = after.partition(_.contains(touchedDir))
    assert(keptA == keptB, "untouched bucket files must be byte-identical paths")
    assert(changedA != changedB, "the touched bucket must be rewritten")
    assert(dir.nonEmpty)
  }

  test("deleted cells stay as tombstones until expiry reclaims the bucket") {
    val s = store(b = 4)
    val keys = ('a' to 'j').map(_.toString)
    s.write(LatestWithTombstones.snapshot(log(keys.map(up(_, "x", 1, "v")))))
    // delete every key living in a's bucket; other buckets stay live
    val sameBucket = keys.filter(k => s.bucketOf(k) == s.bucketOf("a"))
    val remaining = keys.diff(sameBucket)
    assert(remaining.nonEmpty, "fixture must span more than one bucket")
    s.refresh(log(sameBucket.map(k => del(k, "x", 10))))
    sameBucket.foreach(k => assert(s.get(k, "x").isEmpty))
    remaining.foreach(k => assert(s.get(k, "x").nonEmpty))
    // tombstones are RETAINED (late-data safety) until expiry...
    assert(s.contents().filter(_.delete).count() == sameBucket.size)
    // ...which removes the now-empty bucket directory entirely
    s.expireTombstones(horizonUs = 11)
    assert(s.contents().filter(_.delete).count() == 0)
    assert(!s.contents().inputFiles
      .exists(_.contains(s"kb=${s.bucketOf("a")}")))
    remaining.foreach(k => assert(s.get(k, "x").nonEmpty))
  }

  test("late upsert under an already-applied newer delete stays dead " +
      "(the case watermark-ordered merge cannot handle)") {
    val s = store(b = 4)
    s.write(LatestWithTombstones.compactRetaining(log(Seq(
      up("k", "x", 1, "v1"), del("k", "x", 10)))))
    assert(s.get("k", "x").isEmpty)
    s.refresh(log(Seq(up("k", "x", 5, "late")))) // older than the delete
    assert(s.get("k", "x").isEmpty, "retained tombstone must veto late data")
    s.refresh(log(Seq(up("k", "x", 20, "fresh")))) // genuinely newer
    assert(s.get("k", "x").map(e => new String(e.value)) == Some("fresh"))
    // but after expiry the same late element WOULD resurrect — contract
    s.expireTombstones(horizonUs = 100)
    s.refresh(log(Seq(del("k", "x", 30))))
    s.expireTombstones(horizonUs = 100)
    s.refresh(log(Seq(up("k", "x", 25, "zombie"))))
    assert(s.get("k", "x").map(e => new String(e.value)) == Some("zombie"))
  }

  test("an interrupted previous bucket swap is detected, not destroyed") {
    val s = store()
    s.write(LatestWithTombstones.snapshot(log(hist.take(5))))
    java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get(s.path + "_staging"))
    val e = intercept[IllegalArgumentException] {
      s.refresh(log(Seq(up("k1", "status", 100, "x"))))
    }
    assert(e.getMessage.contains("interrupted store swap"))
    new scala.reflect.io.Directory(new java.io.File(s.path + "_staging"))
      .deleteRecursively()
    s.refresh(log(Seq(up("k1", "status", 100, "x"))))
    assert(s.get("k1", "status").map(e2 => new String(e2.value)) == Some("x"))
  }

  test("an interrupted swap fails READS loudly too, not just mutations") {
    // crash inside swapBuckets = live bucket dir already in _swap_trash,
    // staged dir not yet moved in: snapshot/get/multiFetch must refuse
    // rather than silently serve a store with whole buckets missing
    val s = store()
    s.write(LatestWithTombstones.snapshot(log(hist.take(5))))
    val trash = java.nio.file.Paths.get(s.path, "_swap_trash")
    java.nio.file.Files.createDirectories(trash)
    assert(intercept[IllegalArgumentException](s.snapshot())
      .getMessage.contains("interrupted store swap"))
    assert(intercept[IllegalArgumentException](s.get("k1", "status"))
      .getMessage.contains("interrupted store swap"))
    assert(intercept[IllegalArgumentException](s.multiFetch(Seq("k1"), "status"))
      .getMessage.contains("interrupted store swap"))
    java.nio.file.Files.delete(trash)
    assert(s.get("k1", "status").isDefined) // resolved -> reads resume
  }

  test("replicate restart from checkpoint converges (idempotent refresh)") {
    implicit val sq = spark.sqlContext
    implicit val enc = StreamElement.encoder
    val ckpt = Files.createTempDirectory("graft-bss-ckpt2-").toString
    val s = store(b = 4)
    s.write(log(Nil))

    val in1 = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[StreamElement]
    val q1 = s.replicate(in1.toDS(), ckpt).start()
    try {
      in1.addData(up("k1", "x", 1, "v1"), up("k2", "x", 2, "v2"))
      q1.processAllAvailable()
    } finally q1.stop()

    // re-apply batch 1 manually: a restart that replays the last batch
    // must not change the store (refresh is idempotent)
    val before = s.contents().collect()
      .map(e => (e.key, e.attribute, e.stamp, e.uuid)).toSet
    s.refresh(log(Seq(up("k1", "x", 1, "v1"), up("k2", "x", 2, "v2"))))
    val after = s.contents().collect()
      .map(e => (e.key, e.attribute, e.stamp, e.uuid)).toSet
    assert(after == before, "replayed batch must be a no-op")

    // and replaying batch 1 INTERLEAVED with newer data still converges
    // (the restart-with-replay schedule): delete k1 then re-play batch 1
    s.refresh(log(Seq(del("k1", "x", 10))))
    s.refresh(log(Seq(up("k1", "x", 1, "v1"), up("k2", "x", 2, "v2"))))
    assert(s.get("k1", "x").isEmpty, "replay must not resurrect k1")
    assert(s.get("k2", "x").map(e => new String(e.value)) == Some("v2"))
  }

  test("replicate folds a streaming changelog, out-of-order micro-batches") {
    implicit val sq = spark.sqlContext
    implicit val enc = StreamElement.encoder
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[StreamElement]
    val s = store(b = 4)
    s.write(log(Nil)) // empty store
    val q = s.replicate(input.toDS(),
      Files.createTempDirectory("graft-bss-ckpt-").toString).start()
    try {
      input.addData(up("k1", "x", 10, "v10"), up("k2", "x", 11, "v11"))
      q.processAllAvailable()
      input.addData(del("k1", "x", 15), up("k1", "x", 12, "mid"))
      q.processAllAvailable()
      input.addData(up("k1", "x", 13, "late")) // still under the delete
      q.processAllAvailable()
    } finally q.stop()
    assert(s.get("k1", "x").isEmpty)
    assert(s.get("k2", "x").map(e => new String(e.value)) == Some("v11"))
    // store == full compaction of everything that ever streamed in
    val full = LatestWithTombstones.snapshot(log(Seq(
      up("k1", "x", 10, "v10"), up("k2", "x", 11, "v11"),
      del("k1", "x", 15), up("k1", "x", 12, "mid"),
      up("k1", "x", 13, "late")))).collect()
      .map(e => (e.key, e.attribute, e.stamp)).toSet
    assert(s.snapshot().collect()
      .map(e => (e.key, e.attribute, e.stamp)).toSet == full)
  }
}
