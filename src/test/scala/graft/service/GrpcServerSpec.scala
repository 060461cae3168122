package graft.service

import graft.SparkSpec
import graft.core.{GraftOperator, ProtoSchema, Repository}

/** End-to-end exercise of the gRPC transport: a minimal hand-rolled
  * netty HTTP/2 client (h2c prior knowledge) sends REAL gRPC frames —
  * length-prefixed protobuf messages, `:path` routing, trailers with
  * grpc-status — through a socket to [[GrpcServer]], covering every verb
  * of the reference's rpc.proto (ingest/ingestSingle/ingestBulk/commit,
  * get/listAttributes/multifetch/begin/scan).
  */
class GrpcServerSpec extends SparkSpec {
  import GrpcService._

  private def newOp(): GraftOperator = {
    val repo = Repository.parse(
      """entities { user { attributes {
        |  "status" { scheme: string }
        |  "device.*" { scheme: string }
        |} } }
        |attributeFamilies {
        |  user-primary {
        |    entity: user
        |    attributes: [ "*" ]
        |    storage: "inmem://grpc-spec"
        |    type: primary
        |    access: [ commit-log, batch-updates, batch-snapshot, random-access ]
        |  }
        |}""".stripMargin)
    new GraftOperator(spark, repo)
  }

  private def withServer(body: (GrpcTestClient, GraftOperator) => Unit): Unit = {
    val op = newOp()
    val server = new GrpcServer(op, port = 0).start()
    val client = new GrpcTestClient(server.boundPort)
    try body(client, op)
    finally { client.close(); server.stop() }
  }

  private def ingestMsg(key: String, attr: String, stamp: Long, v: String,
      delete: Boolean = false, tx: String = ""): Array[Byte] =
    ProtoSchema.encode(Ingest, Map(
      "entity" -> "user", "key" -> key, "attribute" -> attr,
      "stamp" -> stamp, "delete" -> delete, "transactionId" -> tx,
      "value" -> (if (delete) Array.emptyByteArray else v.getBytes("UTF-8"))))

  private def s2(b: Array[Byte]): String = new String(b, "UTF-8")

  test("unary ingest + get + delete + listAttributes over the wire") {
    withServer { (c, op) =>
      val (st1, g1, _) = c.call("/IngestService/ingest",
        Seq(ingestMsg("u1", "status", 10, "online")))
      assert(g1 == 0)
      val dec1 = ProtoSchema.decode(Status, st1.head)
      assert(dec1("status") == 200L && dec1("uuid").toString.nonEmpty)

      c.call("/IngestService/ingest", Seq(ingestMsg("u1", "device.a", 11, "phone")))
      c.call("/IngestService/ingest", Seq(ingestMsg("u1", "device.b", 12, "tablet")))

      val (got, g2, _) = c.call("/RetrieveService/get",
        Seq(ProtoSchema.encode(GetRequest, Map(
          "entity" -> "user", "key" -> "u1", "attribute" -> "status"))))
      assert(g2 == 0)
      val gd = ProtoSchema.decode(GetResponse, got.head)
      assert(gd("status") == 200L)
      assert(s2(gd("value").asInstanceOf[Array[Byte]]) == "online")
      assert(gd("stamp") == 10L)
      // wire stamps are MILLISECONDS (rpc.proto GetResponse.stamp docs);
      // engine-native stamps are micros — the boundary must convert both
      // directions, so the stored element is stamp*1000
      assert(op.getRandomAccess("user", "status").get("u1", "status")
        .exists(_.stamp == 10000L),
        "wire ms must land as engine micros")

      // wildcard listing with prefix + paging offset
      val (lst, g3, _) = c.call("/RetrieveService/listAttributes",
        Seq(ProtoSchema.encode(ListRequest, Map(
          "entity" -> "user", "key" -> "u1", "wildcardPrefix" -> "device"))))
      assert(g3 == 0)
      val ld = ProtoSchema.decode(ListResponse, lst.head)
      val attrs = ld("value").asInstanceOf[Seq[Any]]
        .map(_.asInstanceOf[Map[String, Any]])
      assert(attrs.map(_("attribute")) == Seq("device.a", "device.b"))
      assert(s2(attrs.head("value").asInstanceOf[Array[Byte]]) == "phone")

      // delete: newest tombstone wins, get answers 404 inside a 0-status rpc
      c.call("/IngestService/ingest",
        Seq(ingestMsg("u1", "status", 20, "", delete = true)))
      val (got2, g4, _) = c.call("/RetrieveService/get",
        Seq(ProtoSchema.encode(GetRequest, Map(
          "entity" -> "user", "key" -> "u1", "attribute" -> "status"))))
      assert(g4 == 0)
      assert(ProtoSchema.decode(GetResponse, got2.head)("status") == 404L)
    }
  }

  test("bidi ingestSingle answers per message; ingestBulk batches") {
    withServer { (c, _) =>
      val (sts, g, _) = c.call("/IngestService/ingestSingle", Seq(
        ingestMsg("u1", "status", 1, "a"),
        ingestMsg("u2", "status", 2, "b"),
        ingestMsg("u3", "nope", 3, "c"))) // unknown attribute -> 404 status
      assert(g == 0 && sts.size == 3)
      val decoded = sts.map(b => ProtoSchema.decode(Status, b))
      assert(decoded.take(2).forall(_("status") == 200L))
      assert(decoded(2)("status") == 404L)

      val bulk = ProtoSchema.encode(IngestBulk, Map("ingest" -> Seq(
        Map("entity" -> "user", "key" -> "u4", "attribute" -> "status",
          "stamp" -> 4L, "value" -> "d".getBytes("UTF-8")),
        Map("entity" -> "user", "key" -> "u5", "attribute" -> "status",
          "stamp" -> 5L, "value" -> "e".getBytes("UTF-8")))))
      val (bsts, g2, _) = c.call("/IngestService/ingestBulk", Seq(bulk))
      assert(g2 == 0)
      val sb = ProtoSchema.decode(StatusBulk, bsts.head)("status")
        .asInstanceOf[Seq[Any]].map(_.asInstanceOf[Map[String, Any]])
      assert(sb.size == 2 && sb.forall(_("status") == 200L))
    }
  }

  test("multifetch preserves order; scan streams the whole snapshot") {
    withServer { (c, _) =>
      (1 to 5).foreach(i =>
        c.call("/IngestService/ingest",
          Seq(ingestMsg(s"u$i", "status", i.toLong, s"v$i"))))
      val mf = ProtoSchema.encode(MultifetchRequest, Map(
        "getRequest" -> Seq(
          Map("entity" -> "user", "key" -> "u2", "attribute" -> "status"),
          Map("entity" -> "user", "key" -> "zz", "attribute" -> "status"),
          Map("entity" -> "user", "key" -> "u4", "attribute" -> "status")),
        "listRequest" -> Seq(
          Map("entity" -> "user", "key" -> "u2", "wildcardPrefix" -> "device"))))
      val (mfr, g, _) = c.call("/RetrieveService/multifetch", Seq(mf))
      assert(g == 0)
      val md = ProtoSchema.decode(MultifetchResponse, mfr.head)
      val gets = md("getResponse").asInstanceOf[Seq[Any]]
        .map(_.asInstanceOf[Map[String, Any]])
      assert(gets.map(_("status")) == Seq(200L, 404L, 200L))
      assert(s2(gets(2)("value").asInstanceOf[Array[Byte]]) == "v4")
      assert(md("listResponse").asInstanceOf[Seq[Any]].size == 1)

      val (chunks, g2, _) = c.call("/RetrieveService/scan",
        Seq(ProtoSchema.encode(ScanRequest, Map("entity" -> "user"))))
      assert(g2 == 0)
      val rows = chunks.flatMap(b =>
        ProtoSchema.decode(ScanResult, b)("value").asInstanceOf[Seq[Any]]
          .map(_.asInstanceOf[Map[String, Any]]))
      assert(rows.map(r => r("key").toString -> s2(
        r("value").asInstanceOf[Array[Byte]])).toMap ==
        (1 to 5).map(i => s"u$i" -> s"v$i").toMap)
    }
  }

  test("server-streaming scan spans multiple chunks through the worker path") {
    // > scanChunk (256) elements: the scan must emit several ScanResult
    // frames through the backpressured worker and close with OK trailers
    val op = newOp()
    val server = new GrpcServer(op, port = 0).start()
    val client = new GrpcTestClient(server.boundPort)
    try {
      val elems = (1 to 600).map(i => graft.core.StreamElement(
        "user", s"k$i", "status", s"u$i", 0L, i.toLong,
        s"v$i".getBytes("UTF-8"), delete = false, deleteWildcard = false))
      op.writeBatch(spark.createDataset(elems)(graft.core.StreamElement.encoder))
      val (chunks, g, m) = client.call("/RetrieveService/scan",
        Seq(ProtoSchema.encode(ScanRequest, Map("entity" -> "user"))))
      assert(g == 0, s"$g $m")
      assert(chunks.size >= 3, s"expected >=3 ScanResult frames, got ${chunks.size}")
      val keys = chunks.flatMap(b =>
        ProtoSchema.decode(ScanResult, b)("value").asInstanceOf[Seq[Any]]
          .map(_.asInstanceOf[Map[String, Any]]("key").toString))
      assert(keys.size == 600 && keys.toSet.size == 600)
    } finally { client.close(); server.stop() }
  }

  test("scan load shedding: over the cap answers RESOURCE_EXHAUSTED") {
    val op = newOp()
    val server = new GrpcServer(op, port = 0, maxConcurrentScans = 0).start()
    val client = new GrpcTestClient(server.boundPort)
    try {
      val (msgs, g, m) = client.call("/RetrieveService/scan",
        Seq(ProtoSchema.encode(ScanRequest, Map("entity" -> "user"))))
      assert(msgs.isEmpty)
      assert(g == GrpcWire.StatusResourceExhausted, s"$g $m")
      assert(m.contains("concurrent scans"))
    } finally { client.close(); server.stop() }
  }

  test("transactions: begin -> transactional ingest -> commit; conflicts reject") {
    withServer { (c, _) =>
      def begin(): String = {
        val (r, g, _) = c.call("/RetrieveService/begin",
          Seq(ProtoSchema.encode(BeginRequest, Map("attributesInvolved" -> Seq(
            Map("entity" -> "user", "key" -> "t1", "attribute" -> "status"))))))
        assert(g == 0)
        ProtoSchema.decode(BeginResponse, r.head)("transactionId").toString
      }
      def commit(tx: String): Long = {
        val (r, g, _) = c.call("/IngestService/commit",
          Seq(ProtoSchema.encode(CommitRequest, Map("transactionId" -> tx))))
        assert(g == 0)
        ProtoSchema.decode(CommitResponse, r.head)("status") match {
          case i: Int => i.toLong; case l: Long => l; case o => o.toString.toLong
        }
      }
      def readStatus(): Long = {
        val (r, _, _) = c.call("/RetrieveService/get",
          Seq(ProtoSchema.encode(GetRequest, Map(
            "entity" -> "user", "key" -> "t1", "attribute" -> "status"))))
        ProtoSchema.decode(GetResponse, r.head)("status") match {
          case l: Long => l; case o => o.toString.toLong
        }
      }

      val tx = begin()
      val (st, g, _) = c.call("/IngestService/ingest",
        Seq(ingestMsg("t1", "status", 100, "committed", tx = tx)))
      assert(g == 0)
      assert(ProtoSchema.decode(Status, st.head)("status") == 200L)
      assert(readStatus() == 404L, "buffered tx write must be invisible")
      assert(commit(tx) == GrpcService.TxCommitted.toLong)
      assert(readStatus() == 200L, "committed write must be visible")
      // double-commit of a closed tx fails deterministically
      assert(commit(tx) == GrpcService.TxFailed.toLong)

      // optimistic conflict: two txs touch the same cell; second rejects
      val a = begin(); val b = begin()
      c.call("/IngestService/ingest",
        Seq(ingestMsg("t1", "status", 200, "A", tx = a)))
      c.call("/IngestService/ingest",
        Seq(ingestMsg("t1", "status", 201, "B", tx = b)))
      assert(commit(a) == GrpcService.TxCommitted.toLong)
      assert(commit(b) == GrpcService.TxRejected.toLong)
    }
  }

  test("grpc-timeout deadline fires as DEADLINE_EXCEEDED") {
    withServer { (c, _) =>
      // 1 nanosecond: expired before the Spark-backed handler can answer
      val (msgs, g, m) = c.call("/IngestService/ingest",
        Seq(ingestMsg("u1", "status", 1, "late")),
        extraHeaders = Map("grpc-timeout" -> "1n"))
      assert(msgs.isEmpty, s"late response must be suppressed: ${msgs.size}")
      assert(g == GrpcWire.StatusDeadlineExceeded, s"$g $m")
      // and a generous deadline does not interfere
      val (ok, g2, _) = c.call("/IngestService/ingest",
        Seq(ingestMsg("u2", "status", 2, "fast")),
        extraHeaders = Map("grpc-timeout" -> "30S"))
      assert(g2 == 0 && ok.size == 1)
    }
  }

  test("responses advertise the wire protocol version (graft-wire-version: 2)") {
    withServer { (c, _) =>
      val (_, g, _) = c.call("/IngestService/ingest",
        Seq(ingestMsg("u1", "status", 10, "on")))
      assert(g == 0)
      // v2 = wire stamps in ms (rpc.proto unit); a v1 client (micros on
      // the wire, rounds <10) detects the break here instead of by
      // misdated data
      assert(c.lastWireVersion == GrpcServer.WireVersion &&
        GrpcServer.WireVersion == "2", c.lastWireVersion)
    }
  }

  test("unknown method answers grpc-status UNIMPLEMENTED") {
    withServer { (c, _) =>
      val (msgs, g, m) = c.call("/IngestService/nope",
        Seq(Array.emptyByteArray))
      assert(msgs.isEmpty)
      assert(g == GrpcWire.StatusUnimplemented, s"got $g $m")
    }
  }

  test("frame reader survives arbitrary chunking and rejects compression") {
    val msgs = Seq("a".getBytes, Array.emptyByteArray, ("x" * 1000).getBytes)
    val wire = msgs.map(GrpcWire.frame).reduce(_ ++ _)
    for (chunkSize <- Seq(1, 2, 3, 7, wire.length)) {
      val r = new GrpcWire.FrameReader()
      val out = wire.grouped(chunkSize).flatMap(r.feed).toSeq
      assert(out.map(_.toSeq) == msgs.map(_.toSeq), s"chunk=$chunkSize")
      assert(r.isClean)
    }
    val bad = GrpcWire.frame("y".getBytes).clone()
    bad(0) = 1 // compressed flag without negotiated encoding
    val e = intercept[GrpcWire.GrpcException](new GrpcWire.FrameReader().feed(bad))
    assert(e.status == GrpcWire.StatusInternal)
  }
}
