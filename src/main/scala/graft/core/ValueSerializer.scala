package graft.core

import java.nio.charset.StandardCharsets
import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Pluggable value (de)serialization, resolved from a scheme URI.
  *
  * Mirrors the reference's scheme registry
  * (reference: core/src/main/java/cz/o2/proxima/core/scheme/ValueSerializer.java:26,
  * ConfigRepository.readSchemeSerializers:493): every attribute value is a
  * `byte[]` plus a serializer chosen by the attribute's `scheme` URI.
  *
  * Spark-first twist: besides the row-at-a-time Scala codec (used by typed
  * helpers and tests), each serializer exposes a **columnar decode** — a
  * `Column => Column` built from `org.apache.spark.sql.functions` so that bulk
  * deserialization stays inside whole-stage codegen instead of a UDF.
  */
trait ValueSerializer[T] extends Serializable {
  def scheme: String
  def sparkType: DataType
  def serialize(t: T): Array[Byte]

  /** Reference contract (core ValueSerializer.java:40-46): "If the
    * deserialization fails the returned value is empty" — corrupt bytes
    * yield None, never an exception. Implementations route through
    * [[parsed]].
    */
  def deserialize(bytes: Array[Byte]): Option[T]

  /** None on null input OR any non-fatal parse failure. */
  protected final def parsed[A](bytes: Array[Byte])(f: Array[Byte] => A): Option[A] =
    try Option(bytes).map(f)
    catch { case scala.util.control.NonFatal(_) => None }

  def defaultValue: T

  /** Columnar decode of a BINARY column into `sparkType`. */
  def decodeColumn(c: Column): Column
  /** Columnar encode into BINARY. */
  def encodeColumn(c: Column): Column
}

object ValueSerializer {

  object BytesSerializer extends ValueSerializer[Array[Byte]] {
    val scheme = "bytes"
    val sparkType: DataType = BinaryType
    def serialize(t: Array[Byte]): Array[Byte] = t
    def deserialize(b: Array[Byte]): Option[Array[Byte]] = Option(b)
    def defaultValue: Array[Byte] = Array.emptyByteArray
    def decodeColumn(c: Column): Column = c
    def encodeColumn(c: Column): Column = c
  }

  object StringSerializer extends ValueSerializer[String] {
    val scheme = "string"
    val sparkType: DataType = StringType
    def serialize(t: String): Array[Byte] = t.getBytes(StandardCharsets.UTF_8)
    def deserialize(b: Array[Byte]): Option[String] =
      Option(b).map(new String(_, StandardCharsets.UTF_8))
    def defaultValue: String = ""
    def decodeColumn(c: Column): Column = c.cast(StringType)
    def encodeColumn(c: Column): Column = encode(c, "UTF-8")
  }

  /** Fixed-width big-endian numerics. Integer columnar codecs stay pure
    * `functions._` expressions (codegen'd): decode goes hex → unsigned
    * decimal → sign-corrected two's complement; encode masks to the field
    * width before hexing so negative values keep their LOW bytes.
    * Float/double columnar codecs need an IEEE-754 bit reinterpretation,
    * which has no builtin — those two are registered Scala UDFs (correct
    * but outside codegen; the typed row codec remains the hot path).
    */
  private def longFromBytes(b: Array[Byte]): Long = {
    require(b.length == 8); ByteBuffer.wrap(b).getLong
  }
  private def intFromBytes(b: Array[Byte]): Int = {
    require(b.length == 4); ByteBuffer.wrap(b).getInt
  }

  /** Signed big-endian decode of an n-byte BINARY column. 8-byte values
    * can exceed Long range unsigned, so they ride through DECIMAL(20,0)
    * for the two's-complement correction; 4-byte values fit in a long.
    */
  private def decodeBigEndianSigned(c: Column, nBytes: Int): Column =
    if (nBytes == 8) {
      val u = conv(hex(c), 16, 10).cast(DecimalType(20, 0))
      val half = new java.math.BigDecimal(java.math.BigInteger.ONE.shiftLeft(63))
      val full = new java.math.BigDecimal(java.math.BigInteger.ONE.shiftLeft(64))
      when(u >= lit(half), (u - lit(full)).cast(LongType))
        .otherwise(u.cast(LongType))
    } else {
      val u = conv(hex(c), 16, 10).cast(LongType)
      val half = 1L << (nBytes * 8 - 1)
      val full = 1L << (nBytes * 8)
      when(u >= half, u - full).otherwise(u)
    }

  object LongSerializer extends ValueSerializer[Long] {
    val scheme = "long"
    val sparkType: DataType = LongType
    def serialize(t: Long): Array[Byte] = ByteBuffer.allocate(8).putLong(t).array()
    def deserialize(b: Array[Byte]): Option[Long] = parsed(b)(longFromBytes)
    def defaultValue: Long = 0L
    def decodeColumn(c: Column): Column = decodeBigEndianSigned(c, 8)
    def encodeColumn(c: Column): Column = unhex(lpad(hex(c), 16, "0"))
  }

  object IntSerializer extends ValueSerializer[Int] {
    val scheme = "integer"
    val sparkType: DataType = IntegerType
    def serialize(t: Int): Array[Byte] = ByteBuffer.allocate(4).putInt(t).array()
    def deserialize(b: Array[Byte]): Option[Int] = parsed(b)(intFromBytes)
    def defaultValue: Int = 0
    def decodeColumn(c: Column): Column =
      decodeBigEndianSigned(c, 4).cast(IntegerType)
    // mask to the low 32 bits BEFORE hexing: a sign-extended negative int
    // hexes to 16 chars and lpad would keep the HIGH half (all FF)
    def encodeColumn(c: Column): Column =
      unhex(lpad(hex(c.cast(LongType).bitwiseAND(lit(0xFFFFFFFFL))), 8, "0"))
  }

  object DoubleSerializer extends ValueSerializer[Double] {
    val scheme = "double"
    val sparkType: DataType = DoubleType
    def serialize(t: Double): Array[Byte] =
      ByteBuffer.allocate(8).putDouble(t).array()
    def deserialize(b: Array[Byte]): Option[Double] =
      parsed(b)(x => java.lang.Double.longBitsToDouble(longFromBytes(x)))
    def defaultValue: Double = 0.0
    private val decodeUdf = udf((b: Array[Byte]) =>
      Option(b).map(x => java.lang.Double.longBitsToDouble(longFromBytes(x))))
    private val encodeUdf = udf((d: java.lang.Double) =>
      Option(d).map(x => serialize(x.doubleValue())))
    def decodeColumn(c: Column): Column = decodeUdf(c)
    def encodeColumn(c: Column): Column = encodeUdf(c)
  }

  object FloatSerializer extends ValueSerializer[Float] {
    val scheme = "float"
    val sparkType: DataType = FloatType
    def serialize(t: Float): Array[Byte] =
      ByteBuffer.allocate(4).putInt(java.lang.Float.floatToIntBits(t)).array()
    def deserialize(b: Array[Byte]): Option[Float] =
      parsed(b)(x => java.lang.Float.intBitsToFloat(intFromBytes(x)))
    def defaultValue: Float = 0.0f
    private val decodeUdf = udf((b: Array[Byte]) =>
      Option(b).map(x => java.lang.Float.intBitsToFloat(intFromBytes(x))))
    private val encodeUdf = udf((f: java.lang.Float) =>
      Option(f).map(x => serialize(x.floatValue())))
    def decodeColumn(c: Column): Column = decodeUdf(c)
    def encodeColumn(c: Column): Column = encodeUdf(c)
  }

  /** JSON payloads stay strings; columnar access via from_json/get_json_object
    * (reference: core/.../scheme/JsonSerializer.java:30).
    */
  object JsonSerializer extends ValueSerializer[String] {
    val scheme = "json"
    val sparkType: DataType = StringType
    def serialize(t: String): Array[Byte] = t.getBytes(StandardCharsets.UTF_8)
    def deserialize(b: Array[Byte]): Option[String] =
      Option(b).map(new String(_, StandardCharsets.UTF_8))
    def defaultValue: String = "{}"
    def decodeColumn(c: Column): Column = c.cast(StringType)
    def encodeColumn(c: Column): Column = encode(c, "UTF-8")
  }

  private val registry: Map[String, ValueSerializer[_]] = Seq(
    BytesSerializer, StringSerializer, IntSerializer, LongSerializer,
    FloatSerializer, DoubleSerializer, JsonSerializer
  ).map(s => s.scheme -> s).toMap

  /** Resolve a serializer from a scheme URI ("string", "json",
    * "avro:<writer-schema-json>", "proto:{<descriptor>}", or
    * "proto-json:{<descriptor>}").
    */
  def of(schemeUri: String): ValueSerializer[_] = {
    val parts = schemeUri.split(":", 2)
    parts(0) match {
      case "avro" if parts.length == 2  => new AvroValueSerializer(parts(1))
      case "proto" if parts.length == 2 => new ProtoValueSerializer(parts(1))
      case "proto-json" if parts.length == 2 =>
        new ProtoJsonValueSerializer(parts(1))
      case "schema-registry" if parts.length == 2 =>
        new SchemaRegistryValueSerializer(parts(1))
      case base => registry.getOrElse(base,
        throw new IllegalArgumentException(s"Unknown scheme: $schemeUri"))
    }
  }

  def sparkTypeOf(schemeUri: String): DataType = of(schemeUri).sparkType
}
