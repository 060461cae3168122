package graft.service

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.util.Base64

import graft.SparkSpec
import graft.core.{GraftOperator, Repository}

/** Wire-level exercise of the HTTP gateway with a real network client —
  * the transport analog of the reference's ingest-server gRPC tests.
  */
class HttpGatewaySpec extends SparkSpec {

  private def post(port: Int, path: String, body: String): String = {
    val client = HttpClient.newHttpClient()
    val req = HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:$port$path"))
      .POST(HttpRequest.BodyPublishers.ofString(body))
      .header("Content-Type", "application/json")
      .build()
    client.send(req, HttpResponse.BodyHandlers.ofString()).body()
  }

  private def b64(s: String): String =
    Base64.getEncoder.encodeToString(s.getBytes("UTF-8"))

  test("ingest/get/list/multifetch over real HTTP") {
    val repo = Repository.parse(
      """entities { gateway { attributes {
        |  "status" { scheme: string }
        |  "device.*" { scheme: bytes }
        |} } }
        |attributeFamilies {
        |  gw-primary {
        |    entity: gateway
        |    attributes: [ "*" ]
        |    storage: "inmem://gw"
        |    type: primary
        |    access: [ commit-log, batch-updates, batch-snapshot, random-access ]
        |  }
        |}""".stripMargin)
    val gw = new HttpGateway(new GraftOperator(spark, repo)).start()
    try {
      val port = gw.boundPort
      // ingest a value
      val r1 = Json.parseObject(post(port, "/ingest",
        s"""{"entity":"gateway","key":"g1","attribute":"status","stamp":1,"value":"${b64("on")}"}"""))
      assert(r1("ok") == true)
      assert(r1("uuid").toString.nonEmpty)
      // unknown attribute rejected
      val r2 = Json.parseObject(post(port, "/ingest",
        s"""{"entity":"gateway","key":"g1","attribute":"nope","stamp":2,"value":"${b64("x")}"}"""))
      assert(r2("ok") == false)
      // bulk ingest wildcard suffixes
      val r3 = Json.parseObject(post(port, "/ingest-bulk",
        s"""{"requests":[
           |{"entity":"gateway","key":"g1","attribute":"device.a","stamp":3,"value":"${b64("da")}"},
           |{"entity":"gateway","key":"g1","attribute":"device.b","stamp":4,"value":"${b64("db")}"},
           |{"entity":"gateway","key":"g2","attribute":"status","stamp":5,"value":"${b64("off")}"}
           |]}""".stripMargin))
      assert(r3("statuses").asInstanceOf[Seq[Any]].size == 3)
      // point get round-trips the value
      val g1 = Json.parseObject(post(port, "/get",
        """{"entity":"gateway","key":"g1","attribute":"status"}"""))
      assert(g1("found") == true)
      assert(new String(Base64.getDecoder.decode(g1("value").toString), "UTF-8") == "on")
      // list attributes with prefix
      val l1 = Json.parseObject(post(port, "/list",
        """{"entity":"gateway","key":"g1","prefix":"device."}"""))
      assert(l1("attributes").asInstanceOf[Seq[Any]].map(_.toString) ==
        Seq("device.a", "device.b"))
      // multifetch
      val mf = Json.parseObject(post(port, "/multifetch",
        """{"entity":"gateway","attribute":"status","keys":["g1","g2","g9"]}"""))
      val vals = mf("values").asInstanceOf[Map[String, Any]]
      assert(vals.keySet == Set("g1", "g2"))
      assert(new String(Base64.getDecoder.decode(vals("g2").toString), "UTF-8") == "off")
      // delete tombstone over the wire hides the value
      val d = Json.parseObject(post(port, "/ingest",
        """{"entity":"gateway","key":"g1","attribute":"status","stamp":9,"delete":true}"""))
      assert(d("ok") == true)
      val g2 = Json.parseObject(post(port, "/get",
        """{"entity":"gateway","key":"g1","attribute":"status"}"""))
      assert(g2("found") == false)
      // malformed request -> error, server stays up
      assert(Json.parseObject(post(port, "/ingest", "{not json")).contains("error"))
      assert(Json.parseObject(post(port, "/get",
        """{"entity":"gateway","key":"g2","attribute":"status"}"""))("found") == true)
    } finally gw.stop()
  }

  test("server-streaming scan and wire transactions (begin/commit/conflict)") {
    val repo = Repository.parse(
      """entities {
        |  gateway { attributes { "status" { scheme: string } } }
        |  other   { attributes { "x" { scheme: string } } }
        |}
        |attributeFamilies {
        |  gw-tx { entity: gateway, attributes: [ "*" ], storage: "inmem://gwtx",
        |          type: primary,
        |          access: [ commit-log, batch-updates, batch-snapshot, random-access ] }
        |  other-p { entity: other, attributes: [ "*" ], storage: "inmem://gwother",
        |            type: primary,
        |            access: [ commit-log, batch-updates, batch-snapshot, random-access ] }
        |}""".stripMargin)
    val gw = new HttpGateway(new GraftOperator(spark, repo)).start()
    try {
      val port = gw.boundPort
      post(port, "/ingest",
        s"""{"entity":"gateway","key":"g1","attribute":"status","stamp":1,"value":"${b64("up")}"}""")
      post(port, "/ingest",
        s"""{"entity":"gateway","key":"g2","attribute":"status","stamp":2,"value":"${b64("down")}"}""")

      // chunked ndjson scan streams the snapshot
      val scan = post(port, "/scan", """{"entity":"gateway"}""")
      val rows = scan.linesIterator.filter(_.nonEmpty)
        .map(Json.parseObject).toSeq
      assert(rows.map(_("key").toString).toSet == Set("g1", "g2"), scan)
      assert(rows.forall(r => new String(Base64.getDecoder
        .decode(r("value").toString), "UTF-8").nonEmpty))
      // maxRows bounds the stream: the scan endpoint is a bounded
      // retrieval surface, not a corpus export
      val capped = post(port, "/scan", """{"entity":"gateway","maxRows":1}""")
      assert(capped.linesIterator.count(_.nonEmpty) == 1, capped)

      // two wire transactions race on the same cell: first commit wins,
      // second aborts with the conflict reason (optimistic validation)
      def begin(): String = Json.parseObject(post(port, "/tx/begin",
        """{"entity":"gateway","attribute":"status"}"""))("tx").toString
      val t1 = begin()
      val t2 = begin()
      val rd = Json.parseObject(post(port, "/tx/get",
        s"""{"tx":"$t1","entity":"gateway","key":"g1","attribute":"status"}"""))
      assert(rd("found") == true)
      // a READ routed to a different family than the tx was begun on is
      // rejected too — it would silently answer found=false while adding
      // the cell to the conflict scope
      val crossRead = post(port, "/tx/get",
        s"""{"tx":"$t1","entity":"other","key":"o1","attribute":"x"}""")
      assert(crossRead.contains("error") && crossRead.contains("begun on"),
        crossRead)
      post(port, "/tx/update",
        s"""{"tx":"$t1","entity":"gateway","key":"g1","attribute":"status","stamp":10,"value":"${b64("t1")}"}""")
      post(port, "/tx/update",
        s"""{"tx":"$t2","entity":"gateway","key":"g1","attribute":"status","stamp":11,"value":"${b64("t2")}"}""")
      val c1 = Json.parseObject(post(port, "/tx/commit", s"""{"tx":"$t1"}"""))
      assert(c1("ok") == true, c1)
      val c2 = Json.parseObject(post(port, "/tx/commit", s"""{"tx":"$t2"}"""))
      assert(c2("ok") == false, "second writer must abort on conflict")
      assert(c2("message").toString.contains("touch"), c2)
      // the committed value is t1's
      val g = Json.parseObject(post(port, "/get",
        """{"entity":"gateway","key":"g1","attribute":"status"}"""))
      assert(new String(Base64.getDecoder.decode(g("value").toString),
        "UTF-8") == "t1")
      // an update routed to a DIFFERENT family than the tx was begun on
      // is rejected (it would land in the wrong commit log)
      val tx4 = begin()
      val cross = post(port, "/tx/update",
        s"""{"tx":"$tx4","entity":"other","key":"o1","attribute":"x","stamp":20,"value":"${b64("v")}"}""")
      assert(cross.contains("error") && cross.contains("begun on"), cross)
      post(port, "/tx/rollback", s"""{"tx":"$tx4"}""")

      // a rolled-back tx leaves no trace; its id is gone afterwards
      val t3 = begin()
      post(port, "/tx/update",
        s"""{"tx":"$t3","entity":"gateway","key":"g9","attribute":"status","stamp":12,"value":"${b64("x")}"}""")
      assert(Json.parseObject(post(port, "/tx/rollback",
        s"""{"tx":"$t3"}"""))("ok") == true)
      assert(Json.parseObject(post(port, "/tx/commit",
        s"""{"tx":"$t3"}""")).contains("error"))
      assert(Json.parseObject(post(port, "/get",
        """{"entity":"gateway","key":"g9","attribute":"status"}"""))("found") == false)
    } finally gw.stop()
  }

  test("scan concurrency cap answers 429, never starves point endpoints") {
    val repo = Repository.parse(
      """entities { gateway { attributes { "status" { scheme: string } } } }
        |attributeFamilies {
        |  gw-cap { entity: gateway, attributes: [ "*" ], storage: "inmem://gwcap",
        |           type: primary,
        |           access: [ commit-log, batch-updates, batch-snapshot, random-access ] }
        |}""".stripMargin)
    // cap of zero: every scan is over the cap — deterministic 429
    val gw = new HttpGateway(new GraftOperator(spark, repo),
      maxConcurrentScans = 0).start()
    try {
      val port = gw.boundPort
      post(port, "/ingest",
        s"""{"entity":"gateway","key":"g1","attribute":"status","stamp":1,"value":"${b64("v")}"}""")
      val over = Json.parseObject(post(port, "/scan", """{"entity":"gateway"}"""))
      assert(over("error").toString.contains("too many concurrent scans"), over)
      // point endpoints keep serving while scans are refused
      assert(Json.parseObject(post(port, "/get",
        """{"entity":"gateway","key":"g1","attribute":"status"}"""))("found") == true)
    } finally gw.stop()
  }

  test("abandoned transactions expire on ANY tx endpoint, not only begin") {
    val repo = Repository.parse(
      """entities { gateway { attributes { "status" { scheme: string } } } }
        |attributeFamilies {
        |  gw-ttl { entity: gateway, attributes: [ "*" ], storage: "inmem://gwttl",
        |           type: primary,
        |           access: [ commit-log, batch-updates, batch-snapshot, random-access ] }
        |}""".stripMargin)
    // negative TTL: every handle is expired the moment any tx endpoint
    // sweeps — no new /tx/begin needed for the sweep to run
    val gw = new HttpGateway(new GraftOperator(spark, repo), txTtlMs = -1L)
      .start()
    try {
      val port = gw.boundPort
      val tx = Json.parseObject(post(port, "/tx/begin",
        """{"entity":"gateway","attribute":"status"}"""))("tx").toString
      val upd = post(port, "/tx/update",
        s"""{"tx":"$tx","entity":"gateway","key":"g1","attribute":"status","stamp":1,"value":"${b64("x")}"}""")
      assert(upd.contains("expired"), s"the update itself must sweep: $upd")
      assert(Json.parseObject(post(port, "/tx/commit",
        s"""{"tx":"$tx"}""")).contains("error"))
    } finally gw.stop()
  }

  test("client-supplied uuid is honored for retry idempotence") {
    val repo = Repository.parse(
      """entities { gateway { attributes { "status" { scheme: string } } } }
        |attributeFamilies {
        |  gw-p { entity: gateway, attributes: [ "*" ], storage: "inmem://gw2",
        |         type: primary, access: [ commit-log, batch-updates ] }
        |}""".stripMargin)
    val gw = new HttpGateway(new GraftOperator(spark, repo)).start()
    try {
      val port = gw.boundPort
      val r = Json.parseObject(post(port, "/ingest",
        s"""{"entity":"gateway","key":"g9","attribute":"status","stamp":5,"value":"${b64("x")}","uuid":"retry-123"}"""))
      assert(r("ok") == true && r("uuid") == "retry-123",
        "the echoed uuid must be the client's, enabling uuid-based dedup on retry")
    } finally gw.stop()
  }

  test("duplex streaming ingest: per-line statuses flush before stream end") {
    val repo = Repository.parse(
      """entities { gateway { attributes { "status" { scheme: string } } } }
        |attributeFamilies {
        |  gw-p { entity: gateway, attributes: [ "*" ], storage: "inmem://gws",
        |         type: primary, access: [ commit-log, batch-updates,
        |           batch-snapshot, random-access ] }
        |}""".stripMargin)
    val gw = new HttpGateway(new GraftOperator(spark, repo)).start()
    val sock = new java.net.Socket("127.0.0.1", gw.boundPort)
    try {
      sock.setSoTimeout(15000)
      val out = sock.getOutputStream
      val in = new java.io.BufferedReader(new java.io.InputStreamReader(
        sock.getInputStream, "UTF-8"))
      out.write(("POST /ingest-stream HTTP/1.1\r\nHost: t\r\n" +
        "Transfer-Encoding: chunked\r\n" +
        "Content-Type: application/x-ndjson\r\n\r\n").getBytes("UTF-8"))
      def chunk(s: String): Unit = {
        out.write((s.length.toHexString + "\r\n" + s + "\r\n").getBytes("UTF-8"))
        out.flush()
      }
      // the response is chunked NDJSON: skip headers/chunk-size framing
      // lines, return the next JSON payload line
      def readStatus(): Map[String, Any] = {
        var l = in.readLine()
        while (l != null && !l.startsWith("{")) l = in.readLine()
        assert(l != null, "stream ended before a status line")
        Json.parseObject(l)
      }

      // line 1 → its status arrives WHILE the request stream is open
      // (no terminal chunk sent yet): that is the bidi contract
      chunk(s"""{"entity":"gateway","key":"s1","attribute":"status","stamp":1,"value":"${b64("on")}"}""" + "\n")
      val s1 = readStatus()
      assert(s1("ok") == true)

      // malformed line answers ok=false and the stream CONTINUES
      chunk("not json at all\n")
      assert(readStatus()("ok") == false)

      // later lines still process after the failure
      chunk(s"""{"entity":"gateway","key":"s2","attribute":"status","stamp":2,"value":"${b64("off")}"}""" + "\n")
      assert(readStatus()("ok") == true)

      chunk("") // terminal chunk: 0\r\n\r\n ends the request body

      // both successful lines landed
      val g = Json.parseObject(post(gw.boundPort, "/get",
        """{"entity":"gateway","key":"s2","attribute":"status"}"""))
      assert(g("found") == true)
    } finally { sock.close(); gw.stop() }
  }

  test("schema registry over real HTTP: register, latest, by-id") {
    graft.core.EmbeddedSchemaRegistry.reset()
    val repo = Repository.parse(
      """entities { gateway { attributes { "status" { scheme: string } } } }""")
    val gw = new HttpGateway(new GraftOperator(spark, repo)).start()
    try {
      val port = gw.boundPort
      val schema =
        """{\"type\":\"record\",\"name\":\"U\",\"fields\":[{\"name\":\"id\",\"type\":\"long\"}]}"""
      val reg = Json.parseObject(post(port, "/schema/register",
        s"""{"registry":"wire-r","subject":"u-value","schema":"$schema"}"""))
      val id = reg("id").toString.toDouble.toLong
      assert(reg("version").toString.toDouble.toLong == 1L)
      // idempotent re-register returns the same id
      val again = Json.parseObject(post(port, "/schema/register",
        s"""{"registry":"wire-r","subject":"u-value","schema":"$schema"}"""))
      assert(again("id").toString.toDouble.toLong == id)
      val latest = Json.parseObject(post(port, "/schema/latest",
        """{"registry":"wire-r","subject":"u-value"}"""))
      assert(latest("found") == true)
      assert(latest("schema").toString.contains("\"name\":\"id\""))
      val byId = Json.parseObject(post(port, "/schema/by-id", s"""{"id":$id}"""))
      assert(byId("found") == true)
      // the wire-registered schema drives the value serializer directly
      val ser = new graft.core.SchemaRegistryValueSerializer("wire-r/u-value")
      val rec = new org.apache.avro.generic.GenericData.Record(
        new org.apache.avro.Schema.Parser().parse(latest("schema").toString))
      rec.put("id", 9L)
      assert(ser.deserialize(ser.serialize(rec)).get.get("id") == 9L)
      assert(Json.parseObject(post(port, "/schema/by-id", """{"id":999}"""))("found") == false)
    } finally gw.stop()
  }
}
