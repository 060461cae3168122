package graft.streaming

import graft.SparkSpec
import graft.core.{GraftOperator, Repository, StreamElement}

/** kafka:// storage seam semantics against the embedded log double:
  * partition routing, per-partition offsets, consumer-group
  * commit/replay, config routing through GraftOperator, and streaming
  * consumption (reference: io-kafka KafkaStorage/KafkaLogReader observe,
  * ack and offset-restore semantics).
  */
class KafkaSeamSpec extends SparkSpec {

  private def up(key: String, attr: String, stamp: Long, v: String) =
    StreamElement("gw", key, attr, s"u-$key-$attr-$stamp", 0, stamp,
      v.getBytes("UTF-8"), delete = false, deleteWildcard = false)

  test("partitioning: same (key, attribute) is totally ordered in one partition") {
    val t = EmbeddedKafka.topic("b1", "t-part", 4)
    val recs = (1 to 20).map(i => t.append(up("k1", "a", i, s"v$i")))
    assert(recs.map(_.partition).distinct.size == 1,
      "one key+attribute must stay in one partition")
    assert(recs.map(_.offset) == (0 until 20).map(_.toLong),
      "offsets must be dense and monotonic within the partition")
    // different keys spread over partitions
    val spread = (1 to 40).map(i => t.append(up(s"k$i", "a", i, "x")).partition)
    assert(spread.distinct.size > 1)
  }

  test("partition locks are PER-PARTITION: an append stalled on one " +
      "partition's monitor never blocks another partition (the scaling " +
      "unit is the partition, not the topic)") {
    val t = EmbeddedKafka.topic("b-locks", "t-locks", 4)
    // find keys routing to partitions 0 and 1
    def keyFor(p: Int): String = Iterator.from(0).map(i => s"lk$i")
      .find(k => t.partitionFor(up(k, "a", 1, "x")) == p).get
    val (k0, k1) = (keyFor(0), keyFor(1))
    // reach the private per-partition buffer (= its monitor) and HOLD it
    val bufField = t.getClass.getDeclaredFields
      .find(_.getName.endsWith("partitions"))
      .getOrElse(fail("no partitions field on Topic"))
    bufField.setAccessible(true)
    val bufs = bufField.get(t).asInstanceOf[Array[AnyRef]]
    val p0Appended = new java.util.concurrent.CountDownLatch(1)
    val p1Appended = new java.util.concurrent.CountDownLatch(1)
    val release = new java.util.concurrent.CountDownLatch(1)
    val holder = new Thread(() => bufs(0).synchronized {
      release.await(10, java.util.concurrent.TimeUnit.SECONDS); ()
    })
    holder.start()
    Thread.sleep(50) // let the holder take partition 0's monitor
    new Thread(() => { t.append(up(k0, "a", 1, "x")); p0Appended.countDown() })
      .start()
    new Thread(() => { t.append(up(k1, "a", 1, "x")); p1Appended.countDown() })
      .start()
    // partition 1 proceeds while partition 0's monitor is held...
    assert(p1Appended.await(5, java.util.concurrent.TimeUnit.SECONDS),
      "append to partition 1 must not wait on partition 0's lock")
    assert(p0Appended.getCount == 1,
      "append to partition 0 must still be blocked (the monitor works)")
    // ...and partition 0 completes once released (no deadlock, no loss)
    release.countDown()
    assert(p0Appended.await(5, java.util.concurrent.TimeUnit.SECONDS))
    assert(t.latestOffsets(0) == 1 && t.latestOffsets(1) == 1)
  }

  test("consumer groups: ack commits offsets, uncommitted tail replays") {
    val t = EmbeddedKafka.topic("b1", "t-groups", 2)
    (1 to 6).foreach(i => t.append(up(s"k$i", "a", i, s"v$i")))
    val c1 = new EmbeddedKafka.Consumer(t, "g1")
    val first = c1.pollUncommitted()
    assert(first.size == 6)
    // ack only what was processed "before the crash": first 4 records
    c1.ack(first.take(4))
    // a new consumer of the same group resumes with the unacked tail
    val c2 = new EmbeddedKafka.Consumer(t, "g1")
    val replay = c2.pollUncommitted()
    assert(replay.map(_.element.uuid).toSet == first.drop(4).map(_.element.uuid).toSet)
    // a different group starts from the beginning
    assert(new EmbeddedKafka.Consumer(t, "g2").pollUncommitted().size == 6)
    // acking everything leaves nothing to replay
    c2.ack(replay)
    assert(c2.pollUncommitted().isEmpty)
    // new appends become visible past the committed position
    t.append(up("k9", "a", 99, "new"))
    assert(c2.pollUncommitted().map(_.element.key) == Seq("k9"))
  }

  test("kafka:// families route through repository config") {
    val repo = Repository.parse(
      """entities { gw { attributes { "status" { scheme: string } } } }
        |attributeFamilies {
        |  gw-kafka {
        |    entity: gw
        |    attributes: [ "status" ]
        |    storage: "kafka://broker-1/gw-commit"
        |    type: primary
        |    access: [ commit-log, batch-updates, batch-snapshot, random-access ]
        |  }
        |}""".stripMargin)
    val op = new GraftOperator(spark, repo)
    assert(op.family("gw-kafka").isInstanceOf[KafkaLogFamily])
    op.write(up("g1", "status", 1, "on"))
    op.write(up("g1", "status", 5, "off"))
    op.write(up("g2", "status", 3, "on"))
    assert(op.getBatchUpdates("gw").count() == 3)
    val snap = op.getBatchSnapshot("gw").collect()
      .map(e => e.key -> new String(e.value, "UTF-8")).toMap
    assert(snap == Map("g1" -> "off", "g2" -> "on"))
    assert(op.getRandomAccess("gw", "status").get("g1", "status")
      .map(e => new String(e.value, "UTF-8")).contains("off"))
  }

  test("streaming over the kafka family replays history then follows appends") {
    val t = EmbeddedKafka.topic("b1", "t-stream", 2)
    val fam = new KafkaLogFamily(spark, t)
    fam.append(Seq(up("k1", "a", 1, "old1"), up("k2", "a", 2, "old2")))
    val q = fam.streamFromOldest()
      .writeStream.format("memory").queryName("kafka_replay")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      assert(spark.sql("SELECT * FROM kafka_replay").count() == 2)
      fam.append(Seq(up("k3", "a", 3, "live")))
      q.processAllAvailable()
      assert(spark.sql("SELECT * FROM kafka_replay").count() == 3)
    } finally q.stop()
  }

  test("DSv2 source: restart resumes from checkpointed offsets") {
    val t = EmbeddedKafka.topic("b1", "t-restart", 2)
    val fam = new KafkaLogFamily(spark, t)
    fam.append(Seq(up("k1", "a", 1, "v1"), up("k2", "a", 2, "v2"),
      up("k3", "a", 3, "v3")))
    val cp = java.nio.file.Files.createTempDirectory("graft-kafka-cp-").toString
    val seen = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    def run(): Unit = {
      val q = fam.streamFromOldest().writeStream
        .option("checkpointLocation", cp)
        .foreachBatch {
          (b: org.apache.spark.sql.Dataset[StreamElement], _: Long) =>
            b.collect().foreach(e => seen.add(e.uuid))
        }
        .start()
      q.processAllAvailable(); q.stop()
    }
    run()
    assert(seen.size == 3, "first run replays the full log")
    fam.append(Seq(up("k4", "a", 4, "v4"), up("k5", "a", 5, "v5")))
    run()
    // a fresh query over the SAME checkpoint must deliver ONLY the two
    // new records — proof the planned offsets were recovered, not reset
    assert(seen.size == 5, s"restart must resume, not replay: $seen")
    import scala.jdk.CollectionConverters._
    assert(seen.asScala.toSeq.distinct.size == 5, "no record delivered twice")
  }

  test("DSv2 source: group option commits processed offsets to the log") {
    val t = EmbeddedKafka.topic("b1", "t-commit", 2)
    val fam = new KafkaLogFamily(spark, t)
    (1 to 5).foreach(i => fam.append(Seq(up(s"k$i", "a", i, s"v$i"))))
    val q = fam.streamFromOldest("g-spark").writeStream
      .format("memory").queryName("kafka_commit").outputMode("append").start()
    try {
      q.processAllAvailable()
      assert(spark.table("kafka_commit").count() == 5)
      // the engine acks a batch's offsets when the NEXT batch starts —
      // trigger one more batch, then the first five must be committed
      fam.append(Seq(up("k6", "a", 6, "v6")))
      q.processAllAvailable()
      assert(t.committed("g-spark").values.sum >= 5,
        s"batch-0 offsets must be committed, got ${t.committed("g-spark")}")
    } finally q.stop()
    // a direct consumer of the group replays at most the final tail
    val remaining = fam.consumer("g-spark").pollUncommitted()
    assert(remaining.map(_.element.key).toSet.subsetOf(Set("k6")),
      s"only the uncommitted tail may replay, got $remaining")
  }

  test("DSv2 source: maxRecordsPerTrigger caps each micro-batch") {
    val t = EmbeddedKafka.topic("b1", "t-throttle", 2)
    val fam = new KafkaLogFamily(spark, t)
    (1 to 7).foreach(i => fam.append(Seq(up(s"k$i", "a", i, s"v$i"))))
    val sizes = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    val q = fam.streamFromOldestThrottled(maxRecordsPerTrigger = 2).writeStream
      .foreachBatch {
        (b: org.apache.spark.sql.Dataset[StreamElement], _: Long) =>
          sizes.add(b.count()); ()
      }
      .start()
    try q.processAllAvailable() finally q.stop()
    import scala.jdk.CollectionConverters._
    val s = sizes.asScala.toSeq.filter(_ > 0)
    assert(s.sum == 7, s"all records delivered: $s")
    assert(s.forall(_ <= 2), s"each batch capped at 2: $s")
    assert(s.size >= 4, s"7 records at cap 2 need >= 4 batches: $s")
  }

  test("DSv2 source: Trigger.AvailableNow drains the snapshot then stops") {
    val t = EmbeddedKafka.topic("b1", "t-availnow", 2)
    val fam = new KafkaLogFamily(spark, t)
    (1 to 5).foreach(i => fam.append(Seq(up(s"k$i", "a", i, s"v$i"))))
    val seen = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val q = fam.streamFromOldestThrottled(maxRecordsPerTrigger = 2).writeStream
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch {
        (b: org.apache.spark.sql.Dataset[StreamElement], _: Long) =>
          b.collect().foreach(e => seen.add(e.uuid))
      }
      .start()
    assert(q.awaitTermination(120000), "AvailableNow query must terminate")
    assert(seen.size == 5, s"snapshot fully drained: $seen")
  }

  test("typed windowed aggregation over the DSv2 stream matches batch") {
    val t = EmbeddedKafka.topic("b1", "t-window", 2)
    val fam = new KafkaLogFamily(spark, t)
    // two keys, stamps spread over three 10s windows (stamps in micros)
    val rows = Seq(
      ("k1", 1000000L), ("k1", 2000000L), ("k1", 11000000L),
      ("k2", 1000000L), ("k2", 21000000L), ("k2", 22000000L), ("k2", 23000000L))
    rows.zipWithIndex.foreach { case ((k, st), i) =>
      fam.append(Seq(up(k, "a", st, s"v$i")))
    }
    // append mode emits a window only after the watermark passes its end;
    // a sentinel far in the future closes every real window (excluded
    // from the comparison on both sides)
    fam.append(Seq(up("flush", "a", 40000000L, "sentinel")))
    // streaming: typed tumbling count over the offset-tracked source
    import graft.SparkSpec.spark.implicits._
    val counts = graft.api.GUnboundedStream.ofElements(fam.streamFromOldest())
      .tumblingAggByKey(sizeMs = 10000, latenessMs = 0)(
        _.key, _ => 1.0, "count")
    val q = counts.writeStream.format("memory").queryName("kafka_windows")
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    assert(q.awaitTermination(120000))
    val got = spark.table("kafka_windows")
      .filter("key != 'flush'")
      .selectExpr("key", "w_start_us", "agg")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    // batch ground truth over the same topic
    val expect = fam.batchUpdates().toDF()
      .filter("key != 'flush'")
      .selectExpr("key", "(stamp div 10000000) * 10000000 AS ws")
      .groupBy("key", "ws").count()
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2).toDouble)).toSet
    assert(got == expect, s"streaming $got != batch $expect")
  }

  test("batch read plans one split per topic partition") {
    val t = EmbeddedKafka.topic("b1", "t-batch-splits", 3)
    val fam = new KafkaLogFamily(spark, t)
    (1 to 9).foreach(i => fam.append(Seq(up(s"k$i", "a", i, s"v$i"))))
    val ds = fam.batchUpdates()
    assert(ds.count() == 9)
    assert(ds.rdd.getNumPartitions == 3,
      "DSv2 batch scan must split by topic partition")
    // stamp-range filter applies on top of the scan
    assert(fam.batchUpdates(from = 3, until = 7).count() == 4)
  }

  test("appendIdempotent drops replayed uuids on a kafka family") {
    val t = EmbeddedKafka.topic("b1", "t-idem", 2)
    val fam = new KafkaLogFamily(spark, t)
    val batch = spark.createDataset(Seq(
      up("k1", "a", 10, "v1"), up("k2", "a", 11, "v2")))(
      graft.core.StreamElement.encoder)
    fam.appendIdempotent(batch)
    // a replayed micro-batch (same uuids) must not duplicate rows
    fam.appendIdempotent(batch)
    assert(fam.batchUpdates().count() == 2)
    // a genuinely new element still lands
    fam.appendIdempotent(spark.createDataset(Seq(up("k3", "a", 12, "v3")))(
      graft.core.StreamElement.encoder))
    assert(fam.batchUpdates().count() == 3)
  }

  test("DSv2 write: batch save appends from executor tasks, reads back") {
    import graft.SparkSpec.spark.implicits._
    val t = EmbeddedKafka.topic("b1", "t-write", 4)
    val elems = (1 to 50).map(i => up(s"k$i", "a", i, s"v$i"))
    elems.toDS().repartition(8)
      .toDF().write.format(KafkaSource.SHORT_NAME)
      .option("broker", "b1").option("topic", "t-write")
      .mode("append").save()
    val back = new KafkaLogFamily(spark, t).batchUpdates().collect()
    assert(back.map(_.uuid).sorted.toSeq == elems.map(_.uuid).sorted)
    assert(t.latestOffsets.values.sum == 50)
    // key routing holds through the write path: one key -> one partition
    val perPart = back.groupBy(e => t.partitionFor(e)).view.mapValues(_.map(_.key).toSet)
    assert(perPart.values.map(_.size).sum == 50)
  }

  test("DSv2 write: rejects a non-StreamElement schema") {
    import graft.SparkSpec.spark.implicits._
    val ex = intercept[Exception] {
      Seq((1, "x")).toDF("a", "b").write.format(KafkaSource.SHORT_NAME)
        .option("broker", "b1").option("topic", "t-write-bad")
        .mode("append").save()
    }
    // the analyzer validates against Table.schema() before the write
    // builder even runs — INCOMPATIBLE_DATA_FOR_TABLE names the column
    assert(ex.getMessage.contains("INCOMPATIBLE_DATA_FOR_TABLE"))
  }

  test("DSv2 write: streaming mirror kafka -> kafka via writeStream") {
    val src = EmbeddedKafka.topic("b1", "t-mirror-src", 2)
    val dst = EmbeddedKafka.topic("b1", "t-mirror-dst", 2)
    val fam = new KafkaLogFamily(spark, src)
    fam.append((1 to 7).map(i => up(s"k$i", "a", i, s"v$i")))
    val q = fam.streamFromOldest().toDF()
      .writeStream.format(KafkaSource.SHORT_NAME)
      .option("broker", "b1").option("topic", "t-mirror-dst")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("graft-mirror-cp-").toString)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(60000)
    val copied = new KafkaLogFamily(spark, dst).batchUpdates().collect()
    assert(copied.map(_.uuid).sorted.toSeq ==
      (1 to 7).map(i => s"u-k$i-a-$i").sorted)
  }

  test("offset json round-trips") {
    val o = Map(0 -> 12L, 1 -> 0L, 3 -> 999L)
    assert(KafkaSource.offsetsFromJson(KafkaSourceOffset(o).json()) == o)
    assert(KafkaSource.offsetsFromJson("{}") == Map.empty[Int, Long])
  }

  test("transactions and transformations run unchanged over a kafka family") {
    val t = EmbeddedKafka.topic("b1", "t-tx", 2)
    val fam = new KafkaLogFamily(spark, t)
    val coord = new graft.core.TransactionCoordinator(fam)
    val tx = coord.begin()
    tx.update(up("k1", "a", 1, "v").copy(entity = "gw"))
    assert(tx.commit() > 0)
    assert(fam.batchUpdates().count() == 1)
    // replicate kafka -> parquet (cross-storage continuous pipeline)
    val dir = java.nio.file.Files.createTempDirectory("graft-kafka-rep-")
    val target = new CommitLogFamily(spark, dir.toString + "/log")
    val q = Transformations.replicate(fam, target, dir.toString + "/ckpt")
    try {
      q.processAllAvailable()
      assert(target.batchUpdates().count() == 1)
    } finally q.stop()
  }
}
