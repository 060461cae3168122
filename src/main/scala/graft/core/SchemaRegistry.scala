package graft.core

import java.nio.ByteBuffer

import scala.collection.concurrent.TrieMap

import org.apache.avro.Schema
import org.apache.avro.generic.{GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.avro.io.{DecoderFactory, EncoderFactory}

import org.apache.spark.sql.Column
import org.apache.spark.sql.types.{BinaryType, DataType}

/** Schema-registry avro scheme — the reference's Confluent registry
  * serializer (reference: scheme/confluent/.../
  * SchemaRegistrySerializerFactory.java:30) over an embedded registry
  * double (no registry client jars or network exist in this build; the
  * double implements the registry's observable contract, the same seam
  * pattern as [[graft.streaming.EmbeddedKafka]]).
  *
  * Wire format is the public Confluent framing: magic byte 0x00, 4-byte
  * big-endian schema id, then the avro binary payload. The id — not the
  * attribute config — names the WRITER schema, which is the point of a
  * registry: records written under schema v1 stay decodable with v1
  * after the subject evolves to v2, and new records carry v2's id.
  */
object EmbeddedSchemaRegistry {

  final case class Registered(id: Int, version: Int, schemaJson: String)

  private val subjects = TrieMap.empty[String, Vector[Registered]]
  private val byIdMap = TrieMap.empty[Int, String]
  private val nextId = new java.util.concurrent.atomic.AtomicInteger(0)

  /** Register a schema under `registry/subject`; re-registering an
    * identical schema returns the existing id (registry semantics).
    */
  def register(registry: String, subject: String, schemaJson: String): Registered =
    synchronized {
      val key = s"$registry/$subject"
      val canonical = new Schema.Parser().parse(schemaJson).toString
      val existing = subjects.getOrElse(key, Vector.empty)
      existing.find(_.schemaJson == canonical).getOrElse {
        val r = Registered(nextId.incrementAndGet(), existing.size + 1, canonical)
        subjects.put(key, existing :+ r)
        byIdMap.put(r.id, canonical)
        r
      }
    }

  def latest(registry: String, subject: String): Option[Registered] =
    subjects.get(s"$registry/$subject").flatMap(_.lastOption)

  def byId(id: Int): Option[String] = byIdMap.get(id)

  /** Drop everything (test isolation). */
  def reset(): Unit = synchronized {
    subjects.clear(); byIdMap.clear(); nextId.set(0)
  }
}

/** `schema-registry:<registry>/<subject>` value serializer: avro records
  * framed with the writer-schema id resolved through the registry.
  */
final class SchemaRegistryValueSerializer(locator: String)
    extends ValueSerializer[GenericRecord] {

  private val (registry, subject) = {
    val i = locator.lastIndexOf('/')
    require(i > 0 && i < locator.length - 1,
      s"schema-registry scheme needs <registry>/<subject>, got '$locator'")
    (locator.substring(0, i), locator.substring(i + 1))
  }

  private def latest: EmbeddedSchemaRegistry.Registered =
    EmbeddedSchemaRegistry.latest(registry, subject).getOrElse(
      throw new IllegalStateException(
        s"no schema registered for subject '$subject' in registry '$registry'"))

  def scheme: String = s"schema-registry:$locator"
  def sparkType: DataType = BinaryType

  /** Encode with the subject's LATEST schema, framed with its id. */
  def serialize(t: GenericRecord): Array[Byte] = {
    val reg = latest
    val schema = new Schema.Parser().parse(reg.schemaJson)
    val out = new java.io.ByteArrayOutputStream()
    out.write(0) // magic byte
    out.write(ByteBuffer.allocate(4).putInt(reg.id).array())
    val enc = EncoderFactory.get().binaryEncoder(out, null)
    new GenericDatumWriter[GenericRecord](schema).write(t, enc)
    enc.flush()
    out.toByteArray
  }

  /** Decode with the WRITER schema the frame's id names — old-version
    * records survive subject evolution.
    */
  def deserialize(bytes: Array[Byte]): Option[GenericRecord] =
    parsed(bytes) { b =>
      require(b.length >= 5 && b(0) == 0,
        s"not a schema-registry frame (need magic 0 + 4-byte id, got ${b.length} bytes)")
      val id = ByteBuffer.wrap(b, 1, 4).getInt
      val schemaJson = EmbeddedSchemaRegistry.byId(id).getOrElse(
        throw new IllegalStateException(s"unknown schema id $id"))
      val schema = new Schema.Parser().parse(schemaJson)
      val dec = DecoderFactory.get().binaryDecoder(b, 5, b.length - 5, null)
      new GenericDatumReader[GenericRecord](schema).read(null, dec)
    }

  def defaultValue: GenericRecord =
    new org.apache.avro.generic.GenericData.Record(
      new Schema.Parser().parse(latest.schemaJson))

  def decodeColumn(c: Column): Column = c // BINARY (no from_avro jar)
  def encodeColumn(c: Column): Column = c

  /** Structural schema of the subject's latest version. */
  def fields: Seq[(String, String)] = {
    import scala.jdk.CollectionConverters._
    new Schema.Parser().parse(latest.schemaJson)
      .getFields.asScala.toSeq.map(f => f.name() -> f.schema().getType.getName)
  }
}
