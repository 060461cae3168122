package graft.service

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.util.Base64

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}

import graft.core.{Access, GraftOperator, StreamElement, TransactionCoordinator, TransactionMode}

/** HTTP/JSON wire transport for the ingest/retrieve services — a real
  * network front door for the engine (reference: the gRPC ingest server,
  * rpc/src/main/proto/rpc.proto IngestService:122 / RetrieveService:387,
  * direct/ingest-server/.../IngestService.java, RetrieveService.java).
  *
  * The reference speaks gRPC; no gRPC or JSON library jars exist in this
  * build, so the transport is the JDK's built-in HTTP server with a
  * hand-rolled minimal JSON codec — same request/response semantics,
  * different framing (documented divergence). Values travel base64.
  *
  * Endpoints (POST, JSON bodies):
  *  - /ingest      {entity, key, attribute, stamp, value?, delete?}
  *                 → {ok, uuid, message?}
  *  - /ingest-bulk {requests: [...]}                → {statuses: [...]}
  *  - /ingest-stream NDJSON request lines → NDJSON status lines, each
  *                 flushed as its line is processed (the rpc.proto:122
  *                 ingestBulk BIDI stream over chunked HTTP/1.1; one-line
  *                 memory, malformed lines answer ok=false and the
  *                 stream continues)
  *  - /get         {entity, key, attribute}         → {found, value?}
  *  - /list        {entity, key, prefix?, offset?, limit?} → {attributes}
  *  - /multifetch  {entity, attribute, keys}        → {values: {key: v}}
  *  - /scan        {entity, attrs?, maxRows?} → chunked JSON-lines
  *                 stream, one {key, attribute, stamp, value} per element
  *                 — the server-streaming scan (rpc.proto scan:410),
  *                 streamed via toLocalIterator (no driver
  *                 materialization of the snapshot). A bounded RETRIEVAL
  *                 surface: pass maxRows for an explicit bound; at most
  *                 GRAFT_GATEWAY_MAX_SCANS run concurrently (429 over)
  *  - /tx/begin    {entity, attribute, mode?}       → {tx}
  *    /tx/get     {tx, entity, key, attribute}      → {found, value?}
  *    /tx/update  {tx, entity, key, attribute, stamp, value?, delete?} → {ok}
  *    /tx/commit  {tx}                              → {ok, seq? | message}
  *    /tx/rollback{tx}                              → {ok}
  *    (rpc.proto begin:405 + TransactionalReadWrite semantics: optimistic
  *    validation at commit, conflicts answer ok=false with the reason —
  *    the wire form of [[graft.core.TransactionCoordinator]])
  *  - /schema/register {registry, subject, schema} → {id, version}
  *    /schema/latest   {registry, subject}         → {found, id?, version?, schema?}
  *    /schema/by-id    {id}                        → {found, schema?}
  *    (the reference's Confluent registry is an HTTP service; these
  *    endpoints put the embedded registry double behind the same wire)
  */
final class HttpGateway(op: GraftOperator, port: Int = 0,
    bindAddress: String = sys.env.getOrElse("GRAFT_BIND", "127.0.0.1"),
    gatewayThreads: Int =
      sys.env.getOrElse("GRAFT_GATEWAY_THREADS", "16").toInt,
    maxConcurrentScans: Int =
      sys.env.getOrElse("GRAFT_GATEWAY_MAX_SCANS", "4").toInt,
    txTtlMs: Long =
      sys.env.getOrElse("GRAFT_TX_TTL_MS", "600000").toLong,
    txRegistry: Option[TxRegistry] = None) {

  // shared with the gRPC transport when the server passes one registry
  // to both — a tx begun over HTTP is then committable over gRPC
  private val txs = txRegistry.getOrElse(new TxRegistry(op, txTtlMs))

  private val ingest = new IngestService(op)
  private val retrieve = new RetrieveService(op)

  private val server: HttpServer =
    HttpServer.create(new InetSocketAddress(bindAddress, port), 0)
  // a BOUNDED pool, NOT the default sequential dispatcher: /scan streams
  // a snapshot at the client's read speed — on the default executor one
  // slow scan client would stall every other endpoint; on an unbounded
  // pool a burst of slow clients would grow threads (each pinning a
  // Spark job) without limit
  private val pool =
    java.util.concurrent.Executors.newFixedThreadPool(gatewayThreads)
  server.setExecutor(pool)

  // /scan responses each hold a thread plus a toLocalIterator-driven job
  // for the client's whole read — cap them BELOW the pool size (enforced,
  // not assumed: a config with maxScans >= threads would let slow scan
  // clients pin every pool thread and starve the point endpoints, the
  // exact failure the cap exists to prevent); excess scans get 429
  private val maxScans: Int =
    math.max(0, math.min(maxConcurrentScans, gatewayThreads - 1))
  // a clamped-to-zero cap disables /scan entirely (every request answers
  // 429) — legitimate only when configured; as a CONSEQUENCE of a 1-thread
  // pool it is a misconfiguration that would masquerade as load shedding,
  // so say it loudly at startup instead of letting the operator discover
  // it one 429 at a time
  if (maxScans == 0 && maxConcurrentScans > 0)
    org.slf4j.LoggerFactory.getLogger(getClass).warn(
      "/scan is DISABLED: maxConcurrentScans={} clamped to 0 by " +
        "gatewayThreads={} (the cap must stay below the pool size); " +
        "raise gatewayThreads to at least 2 to serve scans",
      Int.box(maxConcurrentScans), Int.box(gatewayThreads))
  private val scanPermits = new java.util.concurrent.Semaphore(maxScans)

  /** Bound port (useful when constructed with port 0). */
  def boundPort: Int = server.getAddress.getPort

  private def handler(f: Map[String, Any] => String): HttpHandler =
    new HttpHandler {
      override def handle(ex: HttpExchange): Unit = {
        val (code, body) =
          try {
            val in = new String(ex.getRequestBody.readAllBytes(),
              StandardCharsets.UTF_8)
            (200, f(Json.parseObject(in)))
          } catch {
            case e: Exception =>
              (400, Json.obj("error" -> Option(e.getMessage).getOrElse("bad request")))
          }
        val bytes = body.getBytes(StandardCharsets.UTF_8)
        ex.getResponseHeaders.set("Content-Type", "application/json")
        ex.sendResponseHeaders(code, bytes.length.toLong)
        ex.getResponseBody.write(bytes)
        ex.close()
      }
    }

  private def str(m: Map[String, Any], k: String): String = m(k).toString
  private def lng(m: Map[String, Any], k: String): Long = m(k) match {
    case d: Double => d.toLong
    case l: Long   => l
    case s: String => s.toLong
    case other     => throw new IllegalArgumentException(s"$k: $other")
  }

  private def doIngest(m: Map[String, Any]): IngestService.Status = {
    val delete = m.get("delete").exists(_ == true)
    val value =
      if (delete) null
      else Base64.getDecoder.decode(m.getOrElse("value", "").toString)
    ingest.ingest(str(m, "entity"), str(m, "key"), str(m, "attribute"),
      lng(m, "stamp"), value, delete,
      clientUuid = m.get("uuid").map(_.toString))
  }

  private def statusJson(s: IngestService.Status): String =
    Json.obj("ok" -> s.ok, "uuid" -> s.uuid, "message" -> s.message)

  server.createContext("/ingest", handler(m => statusJson(doIngest(m))))

  server.createContext("/ingest-bulk", handler { m =>
    val reqs = m("requests").asInstanceOf[Seq[Any]]
      .map(_.asInstanceOf[Map[String, Any]])
    "{\"statuses\":[" + reqs.map(r => statusJson(doIngest(r))).mkString(",") + "]}"
  })

  // duplex streaming ingest — the rpc.proto ingestBulk BIDI stream
  // (rpc.proto:122 `rpc ingestBulk(stream IngestBulk) returns (stream
  // StatusBulk)`) over HTTP/1.1 chunked framing: one NDJSON ingest
  // request per input line, its status written (and flushed) as soon as
  // that line is processed — the client reads statuses while still
  // sending, and a malformed line answers ok=false WITHOUT aborting the
  // stream (the reference's per-element StatusBulk contract, not
  // all-or-nothing). Unlike /ingest-bulk nothing buffers: memory is one
  // line, regardless of stream length.
  server.createContext("/ingest-stream", new HttpHandler {
    override def handle(ex: HttpExchange): Unit =
      try {
        val in = new java.io.BufferedReader(new java.io.InputStreamReader(
          ex.getRequestBody, StandardCharsets.UTF_8))
        ex.getResponseHeaders.set("Content-Type", "application/x-ndjson")
        ex.sendResponseHeaders(200, 0L) // chunked
        val out = ex.getResponseBody
        var line = in.readLine()
        while (line != null) {
          if (line.trim.nonEmpty) {
            val status =
              try statusJson(doIngest(Json.parseObject(line)))
              catch { case e: Exception =>
                Json.obj("ok" -> false, "uuid" -> "",
                  "message" -> Option(e.getMessage).getOrElse("bad request")) }
            out.write((status + "\n").getBytes(StandardCharsets.UTF_8))
            out.flush() // duplex: the status must not wait for stream end
          }
          line = in.readLine()
        }
        out.close()
      } catch { case _: Exception => () } // client hung up mid-stream
      finally ex.close()
  })

  server.createContext("/get", handler { m =>
    retrieve.get(str(m, "entity"), str(m, "key"), str(m, "attribute")) match {
      case Some(v) => Json.obj("found" -> true,
        "value" -> Base64.getEncoder.encodeToString(v))
      case None => Json.obj("found" -> false)
    }
  })

  server.createContext("/list", handler { m =>
    val attrs = retrieve.listAttributes(str(m, "entity"), str(m, "key"),
      m.get("prefix").map(_.toString).getOrElse(""),
      m.get("offset").map(x => lng(m, "offset").toInt).getOrElse(0),
      m.get("limit").map(x => lng(m, "limit").toInt).getOrElse(Int.MaxValue))
    "{\"attributes\":[" + attrs.map(Json.quote).mkString(",") + "]}"
  })

  server.createContext("/multifetch", handler { m =>
    val keys = m("keys").asInstanceOf[Seq[Any]].map(_.toString)
    val vals = retrieve.multifetch(str(m, "entity"), str(m, "attribute"), keys)
    "{\"values\":{" + vals.map { case (k, v) =>
      Json.quote(k) + ":" + Json.quote(Base64.getEncoder.encodeToString(v))
    }.mkString(",") + "}}"
  })

  // server-streaming scan (rpc.proto scan:410): chunked JSON lines via
  // toLocalIterator — one partition in flight, never the snapshot. This
  // is a bounded RETRIEVAL surface, not a corpus export: a 100 TB full
  // scan belongs on batchSnapshot + a distributed sink, so clients pass
  // `maxRows` to state their bound (and the stream cuts off there);
  // concurrent scans are capped (429 over the cap) so slow readers can
  // never starve the point endpoints.
  server.createContext("/scan", new HttpHandler {
    override def handle(ex: HttpExchange): Unit =
      try {
        if (!scanPermits.tryAcquire()) {
          val msg = Json.obj("error" ->
            s"too many concurrent scans (cap $maxScans)")
            .getBytes(StandardCharsets.UTF_8)
          ex.getResponseHeaders.set("Content-Type", "application/json")
          ex.sendResponseHeaders(429, msg.length.toLong)
          ex.getResponseBody.write(msg)
          return
        }
        try {
          val in = new String(ex.getRequestBody.readAllBytes(),
            StandardCharsets.UTF_8)
          val m = Json.parseObject(in)
          val attrs = m.get("attrs")
            .map(_.asInstanceOf[Seq[Any]].map(_.toString)).getOrElse(Seq.empty)
          val maxRows =
            m.get("maxRows").map(_ => lng(m, "maxRows")).getOrElse(Long.MaxValue)
          val it = retrieve.scan(str(m, "entity"), attrs: _*).toLocalIterator()
          ex.getResponseHeaders.set("Content-Type", "application/x-ndjson")
          ex.sendResponseHeaders(200, 0L) // chunked
          val out = ex.getResponseBody
          var sent = 0L
          while (it.hasNext && sent < maxRows) {
            val e = it.next()
            out.write((Json.obj("key" -> e.key, "attribute" -> e.attribute,
              "stamp" -> e.stamp,
              "value" -> (if (e.value == null) null
                else Base64.getEncoder.encodeToString(e.value))) + "\n")
              .getBytes(StandardCharsets.UTF_8))
            sent += 1
          }
          out.close()
        } finally scanPermits.release()
      } catch {
        case e: Exception =>
          val msg = Json
            .obj("error" -> Option(e.getMessage).getOrElse("bad request"))
            .getBytes(StandardCharsets.UTF_8)
          try {
            ex.sendResponseHeaders(400, msg.length.toLong)
            ex.getResponseBody.write(msg)
          } catch { case _: Exception => () } // headers may be out already
      } finally ex.close()
  })

  // ---- transactions over the wire (rpc.proto begin:405) ----
  // handles/TTL/coordinators live in the shared TxRegistry so the HTTP
  // and gRPC transports of one server see the SAME transactions

  server.createContext("/tx/begin", handler { m =>
    val mode = m.get("mode").map(_.toString).getOrElse("attribute") match {
      case "attribute" => TransactionMode.Attribute
      case "key"       => TransactionMode.Key
      case "all"       => TransactionMode.All
      case other => throw new IllegalArgumentException(s"unknown mode '$other'")
    }
    val famName = txs.familyNameFor(str(m, "entity"), str(m, "attribute"))
    Json.obj("tx" -> txs.begin(famName, mode))
  })

  server.createContext("/tx/get", handler { m =>
    val h = txs.open(str(m, "tx"))
    val attr = str(m, "attribute")
    // like /tx/update: a read routed to a DIFFERENT family than the tx
    // was begun on would silently answer found=false while still adding
    // the cell to the conflict scope — reject it instead
    txs.requireSameFamily(h, str(m, "entity"), attr)
    h.t.get(str(m, "key"), attr) match {
      case Some(e) if e.value != null => Json.obj("found" -> true,
        "value" -> Base64.getEncoder.encodeToString(e.value))
      case _ => Json.obj("found" -> false)
    }
  })

  server.createContext("/tx/update", handler { m =>
    val entity = str(m, "entity")
    val attr = str(m, "attribute")
    val e = op.repo.entities.getOrElse(entity,
      throw new IllegalArgumentException(s"Unknown entity $entity"))
    require(e.resolve(attr).isDefined, s"Unknown attribute $entity.$attr")
    val h = txs.open(str(m, "tx"))
    // the coordinator appends into the family the tx was BEGUN on — an
    // element routed elsewhere would land in the wrong commit log and be
    // invisible to its own entity's readers
    txs.requireSameFamily(h, entity, attr)
    val delete = m.get("delete").exists(_ == true)
    h.t.update(StreamElement(entity, str(m, "key"), attr,
      java.util.UUID.randomUUID().toString, 0L, lng(m, "stamp"),
      if (delete) null
      else Base64.getDecoder.decode(m.getOrElse("value", "").toString),
      delete, delete && attr.endsWith(".*")))
    Json.obj("ok" -> true)
  })

  server.createContext("/tx/commit", handler { m =>
    val h = txs.take(str(m, "tx"))
    try Json.obj("ok" -> true, "seq" -> h.t.commit())
    catch {
      case e: RuntimeException => Json.obj("ok" -> false,
        "message" -> Option(e.getMessage).getOrElse("rejected"))
    }
  })

  server.createContext("/tx/rollback", handler { m =>
    txs.take(str(m, "tx")) // 400 on unknown id rather than a silent ok
    Json.obj("ok" -> true)
  })

  server.createContext("/schema/register", handler { m =>
    val r = graft.core.EmbeddedSchemaRegistry.register(
      str(m, "registry"), str(m, "subject"), str(m, "schema"))
    Json.obj("id" -> r.id, "version" -> r.version)
  })

  server.createContext("/schema/latest", handler { m =>
    graft.core.EmbeddedSchemaRegistry.latest(
      str(m, "registry"), str(m, "subject")) match {
      case Some(r) => Json.obj("found" -> true, "id" -> r.id,
        "version" -> r.version, "schema" -> r.schemaJson)
      case None => Json.obj("found" -> false)
    }
  })

  server.createContext("/schema/by-id", handler { m =>
    graft.core.EmbeddedSchemaRegistry.byId(lng(m, "id").toInt) match {
      case Some(schema) => Json.obj("found" -> true, "schema" -> schema)
      case None         => Json.obj("found" -> false)
    }
  })

  def start(): HttpGateway = { server.start(); this }
  def stop(): Unit = { server.stop(0); pool.shutdownNow(); () }
}

/** Minimal JSON codec (objects, arrays, strings, numbers, booleans,
  * null; no external JSON jars exist in this build). Shared by the
  * gateway and the proto-json value scheme.
  */
private[graft] object Json {

  def quote(s: String): String = {
    val sb = new StringBuilder("\"")
    s.foreach {
      case '"'  => sb.append("\\\"")
      case '\\' => sb.append("\\\\")
      case '\n' => sb.append("\\n")
      case '\r' => sb.append("\\r")
      case '\t' => sb.append("\\t")
      case c if c < ' ' => sb.append(f"\\u${c.toInt}%04x")
      case c    => sb.append(c)
    }
    sb.append('"').toString
  }

  def obj(fields: (String, Any)*): String =
    "{" + fields.map { case (k, v) => quote(k) + ":" + render(v) }.mkString(",") + "}"

  private def render(v: Any): String = v match {
    case null       => "null"
    case s: String  => quote(s)
    case b: Boolean => b.toString
    case n: Number  => n.toString
    case other      => quote(other.toString)
  }

  def parseObject(s: String): Map[String, Any] = {
    val p = new P(s)
    p.ws()
    val v = p.value()
    v.asInstanceOf[Map[String, Any]]
  }

  private final class P(s: String) {
    private var i = 0
    def ws(): Unit = while (i < s.length && s.charAt(i).isWhitespace) i += 1
    private def ch: Char = s.charAt(i)
    private def expect(c: Char): Unit = {
      ws(); require(i < s.length && ch == c, s"expected '$c' at $i"); i += 1
    }
    def value(): Any = {
      ws()
      ch match {
        case '{' => obj()
        case '[' => arr()
        case '"' => string()
        case 't' => i += 4; true
        case 'f' => i += 5; false
        case 'n' => i += 4; null
        case _   => number()
      }
    }
    private def obj(): Map[String, Any] = {
      expect('{'); ws()
      val m = collection.mutable.LinkedHashMap.empty[String, Any]
      if (ch == '}') { i += 1; return m.toMap }
      var more = true
      while (more) {
        ws()
        val k = string()
        expect(':')
        m(k) = value()
        ws()
        if (ch == ',') i += 1 else more = false
      }
      expect('}')
      m.toMap
    }
    private def arr(): Seq[Any] = {
      expect('['); ws()
      val b = collection.mutable.ArrayBuffer.empty[Any]
      if (ch == ']') { i += 1; return b.toSeq }
      var more = true
      while (more) {
        b += value()
        ws()
        if (ch == ',') i += 1 else more = false
      }
      expect(']')
      b.toSeq
    }
    private def string(): String = {
      expect('"')
      val sb = new StringBuilder
      while (ch != '"') {
        if (ch == '\\') {
          i += 1
          ch match {
            case 'n' => sb.append('\n'); i += 1
            case 'r' => sb.append('\r'); i += 1
            case 't' => sb.append('\t'); i += 1
            case 'u' =>
              sb.append(Integer.parseInt(s.substring(i + 1, i + 5), 16).toChar)
              i += 5
            case c => sb.append(c); i += 1
          }
        } else { sb.append(ch); i += 1 }
      }
      i += 1
      sb.toString
    }
    private def number(): Any = {
      val start = i
      while (i < s.length && (ch.isDigit || "+-.eE".indexOf(ch) >= 0)) i += 1
      val t = s.substring(start, i)
      if (t.exists(c => c == '.' || c == 'e' || c == 'E')) t.toDouble
      else t.toLong
    }
  }
}
