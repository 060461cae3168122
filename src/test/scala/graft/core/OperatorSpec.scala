package graft.core

import java.nio.file.Files

import graft.SparkSpec
import graft.streaming.EventTimeWindows

/** Config-driven operator routing + transactions + event-time windows —
  * the e-shop end-to-end shape of the reference
  * (reference: example/model/src/main/resources/reference.conf; operator
  * routing BeamDataOperator.findSuitableAccessors:217; transactions
  * TransactionLogObserver tests).
  */
class OperatorSpec extends SparkSpec {

  private def up(entity: String, key: String, attr: String, stamp: Long,
      v: String) =
    StreamElement(entity, key, attr, s"u-$key-$attr-$stamp", 0, stamp,
      v.getBytes("UTF-8"), delete = false, deleteWildcard = false)

  private def newOperator(): GraftOperator = {
    val repo = Repository.parse(
      """
        |entities {
        |  user {
        |    attributes {
        |      details: { scheme: json }
        |      "event.*": { scheme: json }
        |    }
        |  }
        |  product { attributes { price: { scheme: double } } }
        |}
        |attributeFamilies {
        |  user-primary { entity: user, attributes: ["*"],
        |    storage: "inmem:///user_primary", type: primary,
        |    access: [commit-log, batch-updates, batch-snapshot, random-access, cached-view] }
        |  product-primary { entity: product, attributes: ["price"],
        |    storage: "inmem:///product_primary", type: primary,
        |    access: [commit-log, batch-updates, batch-snapshot, random-access] }
        |}
        |""".stripMargin)
    new GraftOperator(spark, repo,
      Files.createTempDirectory("graft-opspec-").toString)
  }

  test("write routes to primary family; reads route by access") {
    val op = newOperator()
    op.write(up("user", "u1", "details", 1, "{\"name\":\"a\"}"))
    op.write(up("user", "u1", "details", 5, "{\"name\":\"b\"}"))
    op.write(up("user", "u1", "event.100", 2, "{}"))
    op.write(up("product", "p1", "price", 1, "9.99"))

    assert(op.getBatchUpdates("user").count() == 3)
    val snap = op.getBatchSnapshot("user", attrs = Seq("details")).collect()
    assert(snap.length == 1 && new String(snap.head.value, "UTF-8").contains("b"))
    // wildcard attribute filtering
    assert(op.getBatchUpdates("user", attrs = Seq("event.*")).count() == 1)
    // random access through routing
    assert(op.getRandomAccess("user", "details").get("u1", "details").nonEmpty)
    // unknown access produces routing error
    intercept[IllegalStateException](op.getStream("product", "nope"))
  }

  test("transactions: serialized commits, conflict aborts (TransactionMode KEY)") {
    val op = newOperator()
    op.write(up("user", "u1", "details", 1, "v0"))
    val fam = op.family("user-primary")
    val coord = new TransactionCoordinator(fam)

    // tx1 and tx2 both read the same cell; first commit wins
    val tx1 = coord.begin()
    val tx2 = coord.begin()
    assert(tx1.get("u1", "details").nonEmpty)
    assert(tx2.get("u1", "details").nonEmpty)
    tx1.update(up("user", "u1", "details", 10, "v1"))
    val seq1 = tx1.commit()
    assert(seq1 > 0)
    tx2.update(up("user", "u1", "details", 11, "v2"))
    intercept[coord.TransactionRejectedException](tx2.commit())

    // committed write visible with its sequence id
    val cur = new graft.randomaccess.RandomAccessReader(fam).get("u1", "details")
    assert(cur.map(e => new String(e.value, "UTF-8")).contains("v1"))
    assert(cur.exists(_.seqId == seq1))

    // non-conflicting tx on another key commits fine
    val tx3 = coord.begin()
    assert(tx3.get("u2", "details").isEmpty)
    tx3.update(up("user", "u2", "details", 12, "w"))
    assert(tx3.commit() > seq1)
  }

  test("windowed aggregation with allowed lateness drops too-late data") {
    implicit val sq = spark.sqlContext
    implicit val enc = StreamElement.encoder
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[StreamElement]
    // 10s windows, 5s allowed lateness; stamps in micros
    val q = EventTimeWindows.tumblingCounts(input.toDS(), 10000, 5000)
      .writeStream.format("memory").queryName("wm").outputMode("append")
      .start()
    try {
      input.addData(up("e", "k", "a", 1000000, "x").copy(stamp = 1000000))
      input.addData(up("e", "k", "a", 2000000, "x"))
      q.processAllAvailable()
      // advance watermark far past window [0,10s) + lateness
      input.addData(up("e", "k", "a", 60000000, "x"))
      q.processAllAvailable()
      // late element for the finalized window must be dropped
      input.addData(up("e", "k", "a", 3000000, "late"))
      q.processAllAvailable()
      input.addData(up("e", "k", "a", 99000000, "x"))
      q.processAllAvailable()
      val w0 = spark.sql("SELECT n FROM wm WHERE w_start_us = 0").collect()
      assert(w0.map(_.getLong(0)).toSeq == Seq(2)) // finalized without the late one
    } finally q.stop()
  }

  test("early emitting surfaces partial window results before finalization") {
    implicit val sq = spark.sqlContext
    implicit val enc = StreamElement.encoder
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[StreamElement]
    // update mode = the early-emitting path: each micro-batch emits the
    // window's current partial aggregate (WindowedStream.withEarlyEmitting)
    val writer = EventTimeWindows.tumblingCounts(input.toDS(), 10000, 5000)
      .writeStream.format("memory").queryName("early")
    val q = EventTimeWindows.withEarlyEmitting(writer, intervalMs = 50).start()
    try {
      input.addData(up("e", "k", "a", 1000000, "x"))
      q.processAllAvailable()
      val partial = spark.sql("SELECT n FROM early WHERE w_start_us = 0")
        .collect().map(_.getLong(0)).toSeq
      assert(partial == Seq(1)) // emitted while the window is still open
      input.addData(up("e", "k", "a", 2000000, "x"))
      q.processAllAvailable()
      val updated = spark.sql("SELECT n FROM early WHERE w_start_us = 0")
        .collect().map(_.getLong(0)).sorted.toSeq
      assert(updated == Seq(1L, 2L)) // second partial supersedes the first
    } finally q.stop()
  }

  test("impulse sources") {
    assert(graft.streaming.Impulse.impulse(spark).count() == 1)
    assert(graft.streaming.Impulse.periodicImpulse(spark, 10).isStreaming)
  }

  test("persist writes a typed stream as entity attributes") {
    implicit val tupEnc: org.apache.spark.sql.Encoder[(String, Double, Long)] =
      org.apache.spark.sql.Encoders.tuple(
        org.apache.spark.sql.Encoders.STRING,
        org.apache.spark.sql.Encoders.scalaDouble,
        org.apache.spark.sql.Encoders.scalaLong)
    val fam = new graft.streaming.CommitLogFamily(spark,
      Files.createTempDirectory("graft-persist-").toString + "/log")
    graft.api.GStream.fromSeq(spark, Seq(("u1", 1.5, 10L), ("u2", 2.5, 20L)))
      .persist(fam, "user", _._1, _ => "score", t => t._2.toString.getBytes,
        _._3)
    val read = fam.batchUpdates().collect()
    assert(read.length == 2 && read.forall(_.attribute == "score"))
    assert(read.map(e => e.key -> new String(e.value)).toMap ==
      Map("u1" -> "1.5", "u2" -> "2.5"))
  }

  test("overlapping families: per-family attr filtering, no duplicate reads") {
    // status is covered by BOTH families (write() appends to every
    // covering primary), so a read requesting attrs that route to the
    // two different families must filter each family's rows by the attrs
    // routed THERE — filtering the union by all requested attrs returned
    // the status element once per family.
    val repo = Repository.parse(
      """entities { user2 { attributes {
        |  status: { scheme: bytes }
        |  "device.*": { scheme: bytes }
        |} } }
        |attributeFamilies {
        |  u2-status { entity: user2, attributes: ["status"],
        |    storage: "inmem:///u2_status", type: primary,
        |    access: [commit-log, batch-updates, batch-snapshot] }
        |  u2-all { entity: user2, attributes: ["*"],
        |    storage: "inmem:///u2_all", type: primary,
        |    access: [commit-log, batch-updates, batch-snapshot] }
        |}""".stripMargin)
    val op = new GraftOperator(spark, repo,
      Files.createTempDirectory("graft-opspec-").toString)
    op.write(up("user2", "k1", "status", 1, "s"))
    op.write(up("user2", "k1", "device.1", 2, "d"))
    // sanity: the scalar landed in both storages
    assert(op.family("u2-status").batchUpdates().count() == 1)
    assert(op.family("u2-all").batchUpdates().count() == 2)

    val upd = op.getBatchUpdates("user2", attrs = Seq("status", "device.*"))
      .collect().map(_.attribute).sorted.toSeq
    assert(upd == Seq("device.1", "status"), upd.toString)
    val snap = op.getBatchSnapshot("user2", attrs = Seq("status", "device.*"))
      .collect().map(_.attribute).sorted.toSeq
    assert(snap == Seq("device.1", "status"), snap.toString)
  }

  test("listing surfaces cover every random-access family of the entity") {
    // attributes split across two DISJOINT families: a head-family-only
    // scan listed just one of them
    val repo = Repository.parse(
      """entities { split { attributes {
        |  a1: { scheme: bytes }
        |  a2: { scheme: bytes }
        |} } }
        |attributeFamilies {
        |  sp-a1 { entity: split, attributes: ["a1"],
        |    storage: "inmem:///sp_a1", type: primary,
        |    access: [commit-log, batch-updates, random-access] }
        |  sp-a2 { entity: split, attributes: ["a2"],
        |    storage: "inmem:///sp_a2", type: primary,
        |    access: [commit-log, batch-updates, random-access] }
        |}""".stripMargin)
    val op = new GraftOperator(spark, repo,
      Files.createTempDirectory("graft-opspec-").toString)
    op.write(up("split", "k1", "a1", 1, "x"))
    op.write(up("split", "k1", "a2", 2, "y"))
    op.write(up("split", "k2", "a2", 3, "z")) // key living ONLY in family 2
    assert(op.scanAllAttributes("split", "k1").map(_.attribute).toSeq ==
      Seq("a1", "a2"))
    assert(op.listAllEntityKeys("split", 0, 10) == Seq("k1", "k2"))
    assert(op.listAllEntityKeys("split", 1, 10) == Seq("k2"))
    // overlapping families (scalar + "*") must not double-report a cell
    val op2 = {
      val r2 = Repository.parse(
        """entities { user3 { attributes {
          |  status: { scheme: bytes }
          |  "device.*": { scheme: bytes }
          |} } }
          |attributeFamilies {
          |  u3-status { entity: user3, attributes: ["status"],
          |    storage: "inmem:///u3_status", type: primary,
          |    access: [commit-log, batch-updates, random-access] }
          |  u3-all { entity: user3, attributes: ["*"],
          |    storage: "inmem:///u3_all", type: primary,
          |    access: [commit-log, batch-updates, random-access] }
          |}""".stripMargin)
      new GraftOperator(spark, r2,
        Files.createTempDirectory("graft-opspec-").toString)
    }
    op2.write(up("user3", "k", "status", 1, "s"))
    op2.write(up("user3", "k", "device.1", 2, "d"))
    assert(op2.scanAllAttributes("user3", "k").map(_.attribute).toSeq ==
      Seq("device.1", "status"))
  }

  test("writeBatch: an element no primary family covers throws, not vanishes") {
    val op = newOperator()
    val ok = StreamElement.upsert("product", "p1", "price", "w1", 1L,
      "1.0".getBytes("UTF-8"))
    val ghost = StreamElement.upsert("product", "p2", "ghost", "w2", 2L,
      Array[Byte](1))
    val ex = intercept[IllegalArgumentException](
      op.writeBatch(spark.createDataset(Seq(ok, ghost))(StreamElement.encoder)))
    assert(ex.getMessage.contains("no primary family"), ex.getMessage)
    // nothing from the failed batch may have been half-committed is NOT
    // promised (appends are per-family); what IS promised: the valid-only
    // batch still works
    op.writeBatch(spark.createDataset(Seq(ok))(StreamElement.encoder))
    assert(op.getBatchUpdates("product").count() >= 1)
  }

  test("splitLate and shiftEventTime") {
    val ds = spark.createDataset(Seq(
      up("e", "k", "a", 1000, "old"), up("e", "k", "a", 9000, "new")))(
      StreamElement.encoder)
    val (onTime, late) = EventTimeWindows.splitLate(ds, watermarkStamp = 8000,
      allowedLatenessMs = 2)
    assert(onTime.collect().map(_.stamp).toSet == Set(9000))
    assert(late.collect().map(_.stamp).toSet == Set(1000))
    assert(EventTimeWindows.shiftEventTime(ds, 1).collect()
      .map(_.stamp).toSet == Set(2000, 10000))
  }
}
