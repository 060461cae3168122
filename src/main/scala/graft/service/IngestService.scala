package graft.service

import java.util.UUID

import graft.core.{GraftOperator, StreamElement}

/** In-process ingest/retrieve services mirroring the reference's RPC
  * surface (reference: rpc/src/main/proto/rpc.proto — IngestService:122
  * ingest:143/ingestBulk:131/commit:148; RetrieveService:387 get:390/
  * listAttributes:393/multifetch:399/scan:410; server
  * direct/ingest-server/.../IngestService.java, RetrieveService.java).
  * The gRPC transport is a documented divergence (SURVEY §7 non-goals);
  * the semantics — validation, uuid assignment, delete handling, paged
  * listing, streaming scan — live here, in-process.
  */
object IngestService {
  final case class Status(ok: Boolean, uuid: String, message: String = "")
}

final class IngestService(op: GraftOperator) {
  import IngestService.Status

  /** Single ingest (rpc.proto ingest:143): validates the attribute against
    * the repository, assigns a uuid, routes to the primary family.
    *
    * `clientUuid` is the reference's client-supplied write identity
    * (rpc.proto Ingest.uuid): a client retrying a timed-out request
    * resends the SAME uuid, and downstream uuid-based dedup
    * ([[graft.streaming.AttributeLogFamily.appendIdempotent]], the
    * checkpointed sinks) collapses the duplicates — at-least-once
    * delivery with idempotent effect. Absent, the server assigns one.
    */
  def ingest(entity: String, key: String, attribute: String, stamp: Long,
      value: Array[Byte], delete: Boolean = false,
      clientUuid: Option[String] = None): Status = {
    val e = op.repo.entities.get(entity)
    if (e.isEmpty) return Status(ok = false, "", s"Unknown entity $entity")
    val attr = e.get.resolve(attribute)
    if (attr.isEmpty)
      return Status(ok = false, "", s"Unknown attribute $entity.$attribute")
    val uuid = clientUuid.filter(_.nonEmpty)
      .getOrElse(UUID.randomUUID().toString)
    val isWcDelete = delete && attribute.endsWith(".*")
    val el = StreamElement(entity, key, attribute, uuid, 0L, stamp,
      if (delete) null else value, delete, isWcDelete)
    op.write(el)
    Status(ok = true, uuid)
  }

  /** Bulk ingest (ingestBulk:131, bidi streaming → batch of statuses). */
  def ingestBulk(requests: Seq[(String, String, String, Long, Array[Byte])]): Seq[Status] =
    requests.map { case (e, k, a, s, v) => ingest(e, k, a, s, v) }
}

final class RetrieveService(op: GraftOperator) {

  /** Point read (rpc.proto get:390). */
  def get(entity: String, key: String, attribute: String): Option[Array[Byte]] =
    op.getRandomAccess(entity, attribute).get(key, attribute).map(_.value)

  /** Paged attribute listing for a key, wildcard prefix scans included
    * (listAttributes:393).
    */
  def listAttributes(entity: String, key: String, prefix: String = "",
      offset: Int = 0, limit: Int = Int.MaxValue): Seq[String] = {
    // scanAllAttributes: every random-access family, not just the family
    // of attributes.head — a multi-family entity's other attributes were
    // silently absent. Long-safe page end: offset + limit overflows Int
    // for large non-MaxValue limits and returned an empty page.
    op.scanAllAttributes(entity, key)
      .map(_.attribute).filter(_.startsWith(prefix))
      .slice(offset,
        math.min(offset.toLong + limit.toLong, Int.MaxValue.toLong).toInt)
  }

  /** Batched point reads (multifetch:399). */
  def multifetch(entity: String, attribute: String,
      keys: Seq[String]): Map[String, Array[Byte]] =
    op.getRandomAccess(entity, attribute).multiFetch(keys, attribute)
      .map { case (k, e) => k -> e.value }

  /** Server-streaming full scan (scan:410) — returns the snapshot as a
    * Dataset (the caller streams it; no driver materialization).
    */
  def scan(entity: String, attrs: String*): org.apache.spark.sql.Dataset[StreamElement] =
    op.getBatchSnapshot(entity,
      attrs = if (attrs.isEmpty) Seq.empty else attrs)
}
