package graft.service

import graft.core.{GraftOperator, ProtoSchema, StreamElement}
import graft.core.ProtoSchema.PMessage
import graft.service.GrpcWire.GrpcException

/** Transport-independent gRPC method table for the reference's RPC
  * protocol (reference: rpc/src/main/proto/rpc.proto — IngestService:122
  * ingest:143 / ingestSingle:137 / ingestBulk:131 / commit:148;
  * RetrieveService:387 get:390 / listAttributes:393 / multifetch:399 /
  * begin:405 / scan:410).
  *
  * No protoc and no grpc-java exist in this build, so the messages are
  * the hand-written wire-compatible descriptors below — field numbers
  * and types match rpc.proto exactly, encoded by [[ProtoSchema]]'s
  * protobuf codec — and the transport ([[GrpcServer]]) speaks the real
  * gRPC HTTP/2 framing over netty. A stock grpc client generated from
  * the reference's rpc.proto interoperates at the byte level.
  *
  * Method shapes: every rpc maps to message-at-a-time dispatch —
  * [[PerMessage]] answers one response per request message (covers both
  * unary rpcs and the 1:1 form of the bidi ingest streams; the proto
  * explicitly allows any request/response correspondence) and
  * [[ServerStream]] emits an iterator of responses (scan).
  */
object GrpcService {

  sealed trait Rpc
  /** One response message per request message (unary + bidi 1:1). */
  final case class PerMessage(f: Array[Byte] => Array[Byte]) extends Rpc
  /** One request message, streamed responses (server streaming). */
  final case class ServerStream(f: Array[Byte] => Iterator[Array[Byte]]) extends Rpc

  // ---- wire-compatible message descriptors (rpc.proto field numbers) ----

  /** rpc.proto Ingest:23 (uuid=1 entity=2 attribute=3 key=4 value=5
    * delete=6 stamp=7 transactionId=8).
    */
  val Ingest: PMessage = ProtoSchema.parse(
    "{1:uuid=string;2:entity=string;3:attribute=string;4:key=string;" +
      "5:value=bytes;6:delete=bool;7:stamp=uint64;8:transactionId=string}")

  /** rpc.proto Status:58. */
  val Status: PMessage = ProtoSchema.parse(
    "{1:uuid=string;2:status=uint32;3:statusMessage=string}")

  /** rpc.proto IngestBulk:82 / StatusBulk:93. */
  val IngestBulk: PMessage = ProtoSchema.parse(
    "{1:ingest=repeated {1:uuid=string;2:entity=string;3:attribute=string;" +
      "4:key=string;5:value=bytes;6:delete=bool;7:stamp=uint64;" +
      "8:transactionId=string}}")
  val StatusBulk: PMessage = ProtoSchema.parse(
    "{1:status=repeated {1:uuid=string;2:status=uint32;3:statusMessage=string}}")

  /** rpc.proto TransactionCommitRequest:99 / TransactionCommitResponse:105
    * (status enum UNKNOWN=0 COMMITTED=1 REJECTED=2 FAILED=3).
    */
  val CommitRequest: PMessage = ProtoSchema.parse("{1:transactionId=string}")
  val CommitResponse: PMessage = ProtoSchema.parse("{1:status=enum}")
  val TxCommitted = 1; val TxRejected = 2; val TxFailed = 3

  /** rpc.proto GetRequest:155 / GetResponse:178. */
  val GetRequest: PMessage = ProtoSchema.parse(
    "{1:entity=string;2:key=string;3:attribute=string;4:transactionId=string}")
  val GetResponse: PMessage = ProtoSchema.parse(
    "{1:status=uint32;2:statusMessage=string;3:value=bytes;4:stamp=uint64}")

  /** rpc.proto ListRequest:210 / ListResponse:238 (AttrValue nested). */
  val ListRequest: PMessage = ProtoSchema.parse(
    "{1:entity=string;2:key=string;3:wildcardPrefix=string;4:offset=string;" +
      "5:limit=uint32;6:transactionId=string}")
  val ListResponse: PMessage = ProtoSchema.parse(
    "{1:status=uint32;2:statusMessage=string;" +
      "3:value=repeated {1:attribute=string;2:value=bytes;3:stamp=uint64}}")

  /** rpc.proto MultifetchRequest:278 / MultifetchResponse:298. */
  val MultifetchRequest: PMessage = ProtoSchema.parse(
    "{1:getRequest=repeated {1:entity=string;2:key=string;3:attribute=string;" +
      "4:transactionId=string};" +
      "2:listRequest=repeated {1:entity=string;2:key=string;" +
      "3:wildcardPrefix=string;4:offset=string;5:limit=uint32;" +
      "6:transactionId=string};3:transactionId=string}")
  val MultifetchResponse: PMessage = ProtoSchema.parse(
    "{1:getResponse=repeated {1:status=uint32;2:statusMessage=string;" +
      "3:value=bytes;4:stamp=uint64};" +
      "2:listResponse=repeated {1:status=uint32;2:statusMessage=string;" +
      "3:value=repeated {1:attribute=string;2:value=bytes;3:stamp=uint64}}}")

  /** rpc.proto BeginTransactionRequest:330 / BeginTransactionResponse:346
    * (KeyAttribute:319 nested).
    */
  val BeginRequest: PMessage = ProtoSchema.parse(
    "{1:attributesInvolved=repeated {1:entity=string;2:key=string;" +
      "3:attribute=string};2:transactionId=string}")
  val BeginResponse: PMessage = ProtoSchema.parse("{1:transactionId=string}")

  /** rpc.proto ScanRequest:357 / ScanResult:371 (KeyValue:364, field 5). */
  val ScanRequest: PMessage = ProtoSchema.parse(
    "{1:entity=string;2:attribute=repeated string}")
  val ScanResult: PMessage = ProtoSchema.parse(
    "{5:value=repeated {1:key=string;2:attribute=string;3:value=bytes;" +
      "4:stamp=uint64}}")
}

/** The dispatch logic behind [[GrpcServer]]: decodes requests with the
  * descriptors above, answers through the same [[IngestService]] /
  * [[RetrieveService]] / [[graft.core.TransactionCoordinator]] logic the
  * HTTP gateway serves, encodes responses. Stamps CONVERT at the wire
  * boundary: rpc.proto documents its stamp fields in MILLISECONDS
  * (GetResponse.stamp, Ingest.stamp), while engine-native stamps are
  * micros — a stock reference client reads and writes wall-clock-correct
  * values, at the cost of sub-millisecond truncation on reads (the
  * reference stores micros and serves ms over this API too). The HTTP
  * gateway is our own surface and stays micros end-to-end.
  */
final class GrpcService(op: GraftOperator,
    txTtlMs: Long = sys.env.getOrElse("GRAFT_TX_TTL_MS", "600000").toLong,
    scanChunk: Int = 256,
    txRegistry: Option[TxRegistry] = None) {
  import GrpcService._

  private val ingestSvc = new IngestService(op)
  // shared with the HTTP transport when the server passes one registry
  // to both — see TxRegistry
  private val txs = txRegistry.getOrElse(new TxRegistry(op, txTtlMs))

  private def str(m: Map[String, Any], k: String): String = m(k).toString
  private def lng(m: Map[String, Any], k: String): Long = m(k) match {
    case l: Long => l; case i: Int => i.toLong; case o => o.toString.toLong
  }

  // rpc.proto stamp fields are ms; engine stamps are micros (see class
  // scaladoc). Saturating multiply: a hostile 2^63-scale ms value must
  // clamp, not wrap into the past.
  private def wireMsToMicros(ms: Long): Long =
    if (ms > Long.MaxValue / 1000L) Long.MaxValue
    else if (ms < Long.MinValue / 1000L) Long.MinValue
    else ms * 1000L
  private def microsToWireMs(us: Long): Long = Math.floorDiv(us, 1000L)
  private def reps(m: Map[String, Any], k: String): Seq[Map[String, Any]] =
    m(k).asInstanceOf[Seq[Any]].map(_.asInstanceOf[Map[String, Any]])

  // ---- transactions (shared TxRegistry, see that class) ----

  private def invalid(msg: String): Nothing =
    throw GrpcException(GrpcWire.StatusInvalidArgument, msg)

  private def begin(m: Map[String, Any]): Map[String, Any] = {
    val involved = reps(m, "attributesInvolved")
    if (involved.isEmpty)
      invalid("global transactions (empty attributesInvolved) are not " +
        "supported; name at least the output attributes")
    val fams =
      try involved
        .map(ka => txs.familyNameFor(str(ka, "entity"), str(ka, "attribute")))
        .distinct
      catch { case e: IllegalArgumentException => invalid(e.getMessage) }
    if (fams.size > 1)
      invalid(s"attributes span families ${fams.mkString(", ")} — open one " +
        "transaction per family")
    // a client-supplied id never hijacks an OPEN transaction (its
    // buffered writes would vanish without an error) — duplicates reject
    val id =
      try txs.begin(fams.head,
        requestedId = Some(str(m, "transactionId")))
      catch { case e: IllegalArgumentException => invalid(e.getMessage) }
    Map("transactionId" -> id)
  }

  private def commit(m: Map[String, Any]): Map[String, Any] =
    (try Some(txs.take(str(m, "transactionId")))
    catch { case _: IllegalArgumentException => None }) match {
      case None => Map("status" -> TxFailed)
      case Some(h) =>
        try { h.t.commit(); Map("status" -> TxCommitted) }
        catch {
          // REJECTED strictly means an optimistic-concurrency conflict
          // (writes not applied, retry may succeed); anything else is
          // FAILED — a client retry loop must be able to tell a
          // conflict from broken infrastructure
          case _: graft.core.TransactionCoordinator#TransactionRejectedException =>
            Map("status" -> TxRejected)
          case _: RuntimeException => Map("status" -> TxFailed)
        }
    }

  // ---- ingest ----

  private def ingestOne(m: Map[String, Any]): Map[String, Any] = {
    val txId = str(m, "transactionId")
    val uuid = str(m, "uuid")
    val entity = str(m, "entity"); val attr = str(m, "attribute")
    val delete = m("delete") == true
    if (txId.nonEmpty) {
      // transactional ingest: buffered in the open transaction, visible
      // only after commit (rpc.proto Ingest.transactionId:52)
      val h =
        try txs.open(txId)
        catch { case e: IllegalArgumentException =>
          return Map("uuid" -> uuid, "status" -> 400L,
            "statusMessage" -> e.getMessage)
        }
      try txs.requireSameFamily(h, entity, attr)
      catch { case e: IllegalArgumentException =>
        return Map("uuid" -> uuid, "status" -> 400L,
          "statusMessage" -> e.getMessage)
      }
      // echo the element's ACTUAL uuid: a client that omitted it must
      // learn the generated write identity, or a timed-out retry creates
      // a second element under a fresh uuid (duplicate after commit) —
      // same contract as the non-transactional path's st.uuid
      val elUuid = Option(uuid).filter(_.nonEmpty)
        .getOrElse(java.util.UUID.randomUUID().toString)
      h.t.update(StreamElement(entity, str(m, "key"), attr, elUuid,
        0L, wireMsToMicros(lng(m, "stamp")),
        if (delete) null else m("value").asInstanceOf[Array[Byte]],
        delete, delete && attr.endsWith(".*")))
      Map("uuid" -> elUuid, "status" -> 200L)
    } else {
      val st = ingestSvc.ingest(entity, str(m, "key"), attr,
        wireMsToMicros(lng(m, "stamp")),
        m("value").asInstanceOf[Array[Byte]], delete,
        clientUuid = Option(uuid).filter(_.nonEmpty))
      Map("uuid" -> st.uuid,
        "status" -> (if (st.ok) 200L else 404L),
        "statusMessage" -> st.message)
    }
  }

  // ---- retrieve ----

  private def getOne(m: Map[String, Any]): Map[String, Any] = {
    val entity = str(m, "entity"); val attr = str(m, "attribute")
    val key = str(m, "key"); val txId = str(m, "transactionId")
    try {
      val found =
        if (txId.nonEmpty) {
          val h =
            try txs.open(txId)
            catch { case e: IllegalArgumentException => invalid(e.getMessage) }
          // same guard as /tx/get: a read routed to a DIFFERENT family
          // than the tx was begun on would silently answer not-found
          // while still adding the cell to the conflict scope
          try txs.requireSameFamily(h, entity, attr)
          catch { case e: IllegalArgumentException => invalid(e.getMessage) }
          h.t.get(key, attr)
        } else op.getRandomAccess(entity, attr).get(key, attr)
      found match {
        case Some(e) if e.value != null =>
          Map("status" -> 200L, "value" -> e.value,
            "stamp" -> microsToWireMs(e.stamp))
        case _ => Map("status" -> 404L, "statusMessage" -> "not found")
      }
    } catch {
      case g: GrpcException => throw g
      case e: Exception => Map("status" -> 404L,
        "statusMessage" -> Option(e.getMessage).getOrElse("not found"))
    }
  }

  private def listOne(m: Map[String, Any]): Map[String, Any] =
    try {
      val entity = str(m, "entity")
      val prefix = str(m, "wildcardPrefix")
      val offset = str(m, "offset")
      val limit = lng(m, "limit")
      val all = op.scanAllAttributes(entity, str(m, "key"))
        .filter(e => prefix.isEmpty ||
          e.attribute.startsWith(if (prefix.endsWith(".")) prefix else prefix + "."))
        .filter(e => offset.isEmpty || e.attribute > offset)
        .sortBy(_.attribute)
      // clamp, don't truncate: a uint32 limit >= 2^31 decoded as Long
      // passed `limit > 0` but take(limit.toInt) took a NEGATIVE count
      val page =
        if (limit > 0) all.take(math.min(limit, Int.MaxValue.toLong).toInt)
        else all
      Map("status" -> 200L, "value" -> page.map(e => Map(
        "attribute" -> e.attribute, "value" -> e.value,
        "stamp" -> microsToWireMs(e.stamp))))
    } catch {
      case e: Exception => Map("status" -> 404L,
        "statusMessage" -> Option(e.getMessage).getOrElse("not found"))
    }

  private def multifetch(m: Map[String, Any]): Map[String, Any] = {
    val txId = str(m, "transactionId")
    def withTx(r: Map[String, Any]): Map[String, Any] =
      if (txId.nonEmpty && str(r, "transactionId").isEmpty)
        r.updated("transactionId", txId)
      else r
    val gets = reps(m, "getRequest").map(withTx)
    // batch the NON-transactional point reads by (entity, attribute):
    // RandomAccessReader.multiFetch serves each group with one scan +
    // broadcast semi-join instead of one sequential Spark compaction job
    // per sub-request — the whole point of the endpoint. Transactional
    // reads stay sequential (they consult the tx's write buffer).
    val nonTx = gets.zipWithIndex
      .filter { case (r, _) => str(r, "transactionId").isEmpty }
    val batched: Map[Int, Map[String, Any]] = nonTx
      .groupBy { case (r, _) => (str(r, "entity"), str(r, "attribute")) }
      .flatMap { case ((entity, attr), rs) =>
        try {
          val keys = rs.map { case (r, _) => str(r, "key") }.distinct
          val found = op.getRandomAccess(entity, attr).multiFetch(keys, attr)
          rs.map { case (r, i) =>
            i -> (found.get(str(r, "key")) match {
              case Some(e) if e.value != null =>
                Map[String, Any]("status" -> 200L, "value" -> e.value,
                  "stamp" -> microsToWireMs(e.stamp))
              case _ => Map[String, Any]("status" -> 404L,
                "statusMessage" -> "not found")
            })
          }
        } catch {
          case e: Exception =>
            val err = Map[String, Any]("status" -> 404L,
              "statusMessage" -> Option(e.getMessage).getOrElse("not found"))
            rs.map { case (_, i) => i -> err }
        }
      }
    Map(
      "getResponse" -> gets.zipWithIndex.map { case (r, i) =>
        batched.getOrElse(i, getOne(r)) },
      "listResponse" -> reps(m, "listRequest").map(r => listOne(withTx(r))))
  }

  private def scan(m: Map[String, Any]): Iterator[Array[Byte]] = {
    val entity = str(m, "entity")
    val attrs = m("attribute").asInstanceOf[Seq[Any]].map(_.toString)
    // toLocalIterator: the snapshot streams partition by partition — no
    // driver materialization (the same shape as HttpGateway /scan)
    import scala.jdk.CollectionConverters._
    val it = op.getBatchSnapshot(entity, attrs = attrs)
      .toLocalIterator().asScala
    it.grouped(scanChunk).map { chunk =>
      ProtoSchema.encode(ScanResult, Map("value" -> chunk.map(e => Map(
        "key" -> e.key, "attribute" -> e.attribute,
        "value" -> e.value, "stamp" -> microsToWireMs(e.stamp)))))
    }
  }

  // ---- method table (paths per gRPC: "/<service>/<method>") ----

  private def perMessage(req: PMessage, resp: PMessage)(
      f: Map[String, Any] => Map[String, Any]): Rpc =
    PerMessage(bytes => ProtoSchema.encode(resp, f(ProtoSchema.decode(req, bytes))))

  private val methods: Map[String, Rpc] = Map(
    "/IngestService/ingest" -> perMessage(Ingest, Status)(ingestOne),
    "/IngestService/ingestSingle" -> perMessage(Ingest, Status)(ingestOne),
    "/IngestService/ingestBulk" -> perMessage(IngestBulk, StatusBulk)(m =>
      Map("status" -> reps(m, "ingest").map(ingestOne))),
    "/IngestService/commit" -> perMessage(CommitRequest, CommitResponse)(commit),
    "/RetrieveService/get" -> perMessage(GetRequest, GetResponse)(getOne),
    "/RetrieveService/listAttributes" ->
      perMessage(ListRequest, ListResponse)(listOne),
    "/RetrieveService/multifetch" ->
      perMessage(MultifetchRequest, MultifetchResponse)(multifetch),
    "/RetrieveService/begin" -> perMessage(BeginRequest, BeginResponse)(begin),
    "/RetrieveService/scan" -> ServerStream(bytes =>
      scan(ProtoSchema.decode(ScanRequest, bytes))))

  /** Method lookup; None answers grpc-status UNIMPLEMENTED. */
  def method(path: String): Option[Rpc] = methods.get(path)
}
