package graft.core

import org.apache.spark.sql.{Dataset, Encoder, Encoders, SparkSession}

/** The engine-wide universal changelog datum.
  *
  * Mirrors the reference's upsert/delete event model
  * (reference: core/src/main/java/cz/o2/proxima/core/storage/StreamElement.java:36):
  * every write to any entity attribute is one immutable element carrying the
  * entity key, full attribute name (wildcard suffix included), an event-time
  * stamp (epoch millis), and the serialized value — or a delete tombstone.
  *
  * Spark-first design: this is a flat case class with a stock product encoder,
  * so a changelog is just a `Dataset[StreamElement]` — columnar in Tungsten,
  * codegen-friendly, partitionable by `key`. All engine operators (snapshot
  * compaction, random access, replication) are expressed over this one schema.
  *
  * @param entity    owning entity name
  * @param key       entity instance key
  * @param attribute full attribute name (e.g. "status" or "device.abc123")
  * @param uuid      write identity for dedup (reference StreamElement.java:44)
  * @param seqId     sequential id for transactional writes; 0 = none
  * @param stamp     event time, epoch integer in the PRODUCER's unit —
  *                  this repo's events-derived changelogs stamp MICROS,
  *                  and unit-parameterized operators (StateOps,
  *                  EventTimeWindows, CachedView, StreamingDedup)
  *                  default or accept `stampUnit` accordingly
  * @param value     serialized payload; null iff delete
  * @param delete    delete tombstone for this exact attribute
  * @param deleteWildcard delete of ALL suffixes of a wildcard attribute
  *                  (reference StreamElement.java:145, datamodel.md:111-118)
  */
final case class StreamElement(
    entity: String,
    key: String,
    attribute: String,
    uuid: String,
    seqId: Long,
    stamp: Long,
    value: Array[Byte],
    delete: Boolean,
    deleteWildcard: Boolean) {

  def isDelete: Boolean = delete || deleteWildcard

  /** Wildcard prefix of the attribute (text before the first '.'), or the
    * whole attribute for scalar attributes.
    */
  def attributePrefix: String = StreamElement.prefixOf(attribute)

  /** Last-writer-wins ordering position (reference orders replays by
    * stamp with sequential-id tiebreak, StreamElement.java:44; uuid
    * breaks exact ties deterministically). THE one definition — every
    * storage and compaction ranks winners with this tuple under
    * [[StreamElement.positionOrdering]]; a second copy that drifts makes
    * storages disagree on winners.
    */
  def position: (Long, Long, String) = (stamp, seqId, uuid)
}

object StreamElement {
  /** Wildcard prefix of an attribute NAME (text up to and including the
    * first '.', the whole name for scalars) — the one rule every storage
    * routes tombstone coverage through (instance form:
    * [[StreamElement.attributePrefix]]).
    */
  def prefixOf(attribute: String): String = {
    val i = attribute.indexOf('.')
    if (i < 0) attribute else attribute.substring(0, i + 1)
  }

  /** Ordering companion of [[StreamElement.position]]. */
  val positionOrdering: Ordering[(Long, Long, String)] =
    implicitly[Ordering[(Long, Long, String)]]

  implicit val encoder: Encoder[StreamElement] = Encoders.product[StreamElement]

  /** Upsert factory (reference StreamElement.upsert, StreamElement.java:52). */
  def upsert(
      entity: String,
      key: String,
      attribute: String,
      uuid: String,
      stamp: Long,
      value: Array[Byte]): StreamElement =
    StreamElement(entity, key, attribute, uuid, 0L, stamp, value,
      delete = false, deleteWildcard = false)

  /** Delete tombstone (reference StreamElement.delete, StreamElement.java:100). */
  def delete(
      entity: String,
      key: String,
      attribute: String,
      uuid: String,
      stamp: Long): StreamElement =
    StreamElement(entity, key, attribute, uuid, 0L, stamp, null,
      delete = true, deleteWildcard = false)

  /** Wildcard-delete tombstone: wipes every suffix of `wildcardPrefix` (must
    * end with '.') for `key` at stamps <= `stamp`
    * (reference StreamElement.deleteWildcard, StreamElement.java:145).
    */
  def deleteWildcard(
      entity: String,
      key: String,
      wildcardPrefix: String,
      uuid: String,
      stamp: Long): StreamElement = {
    require(wildcardPrefix.endsWith("."),
      s"wildcard prefix must end with '.', got $wildcardPrefix")
    StreamElement(entity, key, wildcardPrefix + "*", uuid, 0L, stamp, null,
      delete = true, deleteWildcard = true)
  }

  def emptyDs(spark: SparkSession): Dataset[StreamElement] =
    spark.emptyDataset[StreamElement](encoder)
}
