package graft.core

import java.io.ByteArrayOutputStream

import org.apache.avro.Schema
import org.apache.avro.generic.{GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.avro.io.{DecoderFactory, EncoderFactory}

import org.apache.spark.sql.Column
import org.apache.spark.sql.types.{BinaryType, DataType}

/** Avro scheme serializer — the reference's `avro:<schema>` value scheme
  * (reference: scheme/avro/.../AvroSerializerFactory.java:37) over Avro's
  * generic API: scheme URI carries the writer schema JSON, values are
  * binary-encoded GenericRecords.
  *
  * The columnar path keeps BINARY (this build has no spark-avro `from_avro`
  * connector jar); typed access goes through the row codec, and structural
  * introspection through [[schema]] — the AttributeValueAccessor analog.
  */
final class AvroValueSerializer(schemaJson: String)
    extends ValueSerializer[GenericRecord] {

  @transient private lazy val schema: Schema =
    new Schema.Parser().parse(schemaJson)

  def scheme: String = s"avro:$schemaJson"
  def sparkType: DataType = BinaryType

  def serialize(t: GenericRecord): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    val enc = EncoderFactory.get().binaryEncoder(out, null)
    new GenericDatumWriter[GenericRecord](schema).write(t, enc)
    enc.flush()
    out.toByteArray
  }

  def deserialize(bytes: Array[Byte]): Option[GenericRecord] =
    parsed(bytes) { b =>
      val dec = DecoderFactory.get().binaryDecoder(b, null)
      new GenericDatumReader[GenericRecord](schema).read(null, dec)
    }

  def defaultValue: GenericRecord =
    new org.apache.avro.generic.GenericData.Record(schema)

  def decodeColumn(c: Column): Column = c // stays BINARY (no from_avro jar)
  def encodeColumn(c: Column): Column = c

  /** Structural schema (SchemaDescriptors analog): field names and types. */
  def fields: Seq[(String, String)] = {
    import scala.jdk.CollectionConverters._
    schema.getFields.asScala.toSeq.map(f => f.name() -> f.schema().getType.getName)
  }
}
