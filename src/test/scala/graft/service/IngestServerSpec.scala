package graft.service

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.file.Files
import java.util.Base64

import graft.SparkSpec

/** The deployable process end-to-end: boot from a config FILE, ingest
  * over real HTTP, watch the config-declared transformation route the
  * write cross-entity, read everything back over the wire.
  */
class IngestServerSpec extends SparkSpec {

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

  test("boot from config path, ingest over HTTP, transformation routes, read back") {
    // the reference's EventDataToUserHistory scenario, as a deployed config
    val conf =
      """entities {
        |  event { attributes { "data" { scheme: bytes } } }
        |  user  { attributes { "event.*" { scheme: bytes } } }
        |}
        |attributeFamilies {
        |  event-commit {
        |    entity: event
        |    attributes: [ "data" ]
        |    storage: "inmem://is-event"
        |    type: primary
        |    access: [ commit-log, batch-updates, random-access ]
        |  }
        |  user-history {
        |    entity: user
        |    attributes: [ "event.*" ]
        |    storage: "inmem://is-user"
        |    type: primary
        |    access: [ commit-log, batch-updates, batch-snapshot, random-access ]
        |  }
        |}
        |transformations {
        |  event-to-history {
        |    entity: event
        |    attributes: [ "data" ]
        |    using: "graft.core.EventToUserHistory"
        |  }
        |}""".stripMargin
    val confPath = Files.createTempDirectory("graft-ingest-conf-")
      .resolve("graft.conf")
    Files.write(confPath, conf.getBytes("UTF-8"))

    val h = IngestServer.bootFromPath(spark, confPath.toString)
    try {
      assert(h.transformations.size == 1)
      val port = h.port

      // ingest an event over the wire
      val r = Json.parseObject(post(port, "/ingest",
        s"""{"entity":"event","key":"e1","attribute":"data","stamp":100,"value":"${b64("click")}"}"""))
      assert(r("ok") == true, r)

      // the declared transformation routes it to user.event.100
      h.transformations.foreach(_.processAllAvailable())
      val got = Json.parseObject(post(port, "/get",
        """{"entity":"user","key":"user-e1","attribute":"event.100"}"""))
      assert(got("found") == true, got)
      assert(new String(Base64.getDecoder.decode(got("value").toString),
        "UTF-8") == "click")

      // a second event flows through the same running query
      post(port, "/ingest",
        s"""{"entity":"event","key":"e2","attribute":"data","stamp":200,"value":"${b64("view")}"}""")
      h.transformations.foreach(_.processAllAvailable())
      val listed = post(port, "/list",
        """{"entity":"user","key":"user-e2","prefix":"event."}""")
      assert(listed.contains("event.200"), listed)

      // the same boot also opens the gRPC front door: read the
      // transformed cell back over real gRPC frames
      val grpc = new GrpcTestClient(h.grpcPort)
      try {
        val (resp, g, _) = grpc.call("/RetrieveService/get",
          Seq(graft.core.ProtoSchema.encode(GrpcService.GetRequest, Map(
            "entity" -> "user", "key" -> "user-e1",
            "attribute" -> "event.100"))))
        assert(g == 0)
        val gd = graft.core.ProtoSchema.decode(GrpcService.GetResponse, resp.head)
        assert(gd("status") == 200L, gd)
        assert(new String(gd("value").asInstanceOf[Array[Byte]], "UTF-8")
          == "click")

        // ONE TxRegistry across transports: a transaction begun and
        // written over HTTP commits over gRPC, and the write is then
        // visible to both
        val tx = Json.parseObject(post(port, "/tx/begin",
          """{"entity":"user","attribute":"event.1"}"""))("tx").toString
        val upd = Json.parseObject(post(port, "/tx/update",
          s"""{"tx":"$tx","entity":"user","key":"user-tx","attribute":"event.7","stamp":7,"value":"${b64("cross")}"}"""))
        assert(upd("ok") == true, upd)
        val (cr, cg, _) = grpc.call("/IngestService/commit",
          Seq(graft.core.ProtoSchema.encode(GrpcService.CommitRequest,
            Map("transactionId" -> tx))))
        assert(cg == 0)
        assert(graft.core.ProtoSchema.decode(GrpcService.CommitResponse,
          cr.head)("status") == GrpcService.TxCommitted)
        val got2 = Json.parseObject(post(port, "/get",
          """{"entity":"user","key":"user-tx","attribute":"event.7"}"""))
        assert(got2("found") == true, got2)
      } finally grpc.close()
    } finally h.stop()
  }
}
