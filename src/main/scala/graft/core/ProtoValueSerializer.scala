package graft.core

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets

import org.apache.spark.sql.{Column, Row}
import org.apache.spark.sql.api.java.UDF1
import org.apache.spark.sql.functions.udf
import org.apache.spark.sql.types._

/** Protobuf value scheme — the reference's `proto:<message>` scheme
  * (reference: scheme/proto/.../ProtoSerializerFactory.java:71, serializer
  * :124, structural access ProtoMessageValueAccessor:136).
  *
  * The reference resolves a compiled protobuf class from the classpath;
  * this build has no protobuf-java jar, so the codec implements the
  * protobuf WIRE FORMAT (public encoding spec: varint, zigzag, 32/64-bit
  * little-endian, length-delimited, packed repeated) directly against a
  * message descriptor carried inline in the scheme URI:
  *
  * {{{
  * proto:{1:id=int64;2:title=string;3:tags=repeated string;
  *        4:score=double;5:meta={1:lang=string;2:rank=int32}}
  * }}}
  *
  * Bytes produced here are parseable by any protobuf runtime with the
  * matching .proto definition, and vice versa. Values are
  * `Map[String, Any]` (nested messages are nested maps, repeated fields
  * are `Seq`) — the DynamicMessage analog. Unknown fields on the wire are
  * skipped by wire type, proto3 defaults are omitted on write and filled
  * on read.
  *
  * Spark-first: [[sparkType]] maps the descriptor to a `StructType` and
  * [[decodeColumn]] deserializes a BINARY column into it (UDF — there is
  * no builtin protobuf codec in this build), so proto-typed attributes
  * join the columnar pipeline as first-class nested rows.
  */
object ProtoSchema {

  sealed trait PType
  final case class PScalar(kind: String) extends PType
  final case class PMessage(fields: Seq[PField]) extends PType
  final case class PRepeated(elem: PType) extends PType
  final case class PField(number: Int, name: String, tpe: PType)

  val ScalarKinds: Set[String] = Set(
    "int32", "int64", "uint32", "uint64", "sint32", "sint64",
    "fixed32", "fixed64", "sfixed32", "sfixed64",
    "bool", "enum", "float", "double", "string", "bytes")

  /** Parse the inline descriptor DSL: `{1:name=type;2:name={...};...}`. */
  def parse(s: String): PMessage = {
    val p = new Parser(s.trim)
    val m = p.parseMessage()
    p.skipWs()
    require(p.atEnd, s"trailing input in proto descriptor at ${p.pos}")
    m
  }

  private final class Parser(s: String) {
    var pos = 0
    def atEnd: Boolean = pos >= s.length
    def peek: Char = if (atEnd) 0.toChar else s.charAt(pos)
    def skipWs(): Unit = while (!atEnd && s.charAt(pos).isWhitespace) pos += 1
    private def expect(c: Char): Unit = {
      skipWs()
      require(peek == c, s"expected '$c' at $pos in $s")
      pos += 1
    }
    def parseMessage(): PMessage = {
      expect('{')
      val fields = collection.mutable.ArrayBuffer.empty[PField]
      skipWs()
      while (peek != '}') {
        fields += parseField()
        skipWs()
        if (peek == ';') { pos += 1; skipWs() }
      }
      expect('}')
      val nums = fields.map(_.number)
      require(nums.distinct.size == nums.size, s"duplicate field numbers: $nums")
      PMessage(fields.toSeq)
    }
    private def parseField(): PField = {
      skipWs()
      val start = pos
      while (!atEnd && s.charAt(pos).isDigit) pos += 1
      require(pos > start, s"expected field number at $start in $s")
      val number = s.substring(start, pos).toInt
      require(number >= 1, s"field numbers start at 1, got $number")
      expect(':')
      skipWs()
      val ns = pos
      while (!atEnd && (s.charAt(pos).isLetterOrDigit || s.charAt(pos) == '_')) pos += 1
      val name = s.substring(ns, pos)
      require(name.nonEmpty, s"expected field name at $ns")
      expect('=')
      PField(number, name, parseType())
    }
    private def parseType(): PType = {
      skipWs()
      if (peek == '{') parseMessage()
      else {
        val ts = pos
        while (!atEnd && (s.charAt(pos).isLetterOrDigit || s.charAt(pos) == '_')) pos += 1
        val word = s.substring(ts, pos)
        if (word == "repeated") PRepeated(parseType())
        else {
          require(ScalarKinds.contains(word), s"unknown proto type '$word'")
          PScalar(word)
        }
      }
    }
  }

  /** Spark mapping of a descriptor (AttributeValueType analog:
    * STRUCTURE→StructType, ARRAY→ArrayType, primitives→atomics).
    */
  def sparkTypeOf(t: PType): DataType = t match {
    case PMessage(fields) =>
      StructType(fields.map(f => StructField(f.name, sparkTypeOf(f.tpe))))
    case PRepeated(e) => ArrayType(sparkTypeOf(e))
    case PScalar(k) => k match {
      case "int32" | "sint32" | "sfixed32" | "enum" => IntegerType
      case "uint32" | "int64" | "sint64" | "uint64" |
           "fixed64" | "sfixed64"                   => LongType
      case "fixed32"                                => LongType
      case "bool"                                   => BooleanType
      case "float"                                  => FloatType
      case "double"                                 => DoubleType
      case "string"                                 => StringType
      case "bytes"                                  => BinaryType
    }
  }

  // ---- wire codec (protobuf encoding spec) ----

  private def wireTypeOf(kind: String): Int = kind match {
    case "double" | "fixed64" | "sfixed64"        => 1
    case "string" | "bytes"                        => 2
    case "float" | "fixed32" | "sfixed32"          => 5
    case _                                         => 0 // varints
  }

  private def writeVarint(out: ByteArrayOutputStream, v0: Long): Unit = {
    var v = v0
    while ((v & ~0x7FL) != 0L) {
      out.write(((v & 0x7F) | 0x80).toInt)
      v >>>= 7
    }
    out.write(v.toInt & 0x7F)
  }
  private def zigzag64(v: Long): Long = (v << 1) ^ (v >> 63)
  private def unzigzag64(v: Long): Long = (v >>> 1) ^ -(v & 1)

  private def writeLe(out: ByteArrayOutputStream, v: Long, bytes: Int): Unit = {
    var i = 0
    while (i < bytes) { out.write(((v >>> (8 * i)) & 0xFF).toInt); i += 1 }
  }

  private def numToLong(a: Any): Long = a match {
    case i: Int     => i.toLong
    case l: Long    => l
    case s: Short   => s.toLong
    case b: Byte    => b.toLong
    case b: Boolean => if (b) 1L else 0L
    case other => throw new IllegalArgumentException(s"not an integer: $other")
  }

  private def scalarBits(kind: String, a: Any): Long = kind match {
    case "double" => java.lang.Double.doubleToLongBits(a match {
      case d: Double => d; case f: Float => f.toDouble
      case n => numToLong(n).toDouble
    })
    case "float" => java.lang.Float.floatToIntBits(a match {
      case f: Float => f; case d: Double => d.toFloat
      case n => numToLong(n).toFloat
    }).toLong & 0xFFFFFFFFL
    case "sint32" | "sint64" => zigzag64(numToLong(a))
    case _ => numToLong(a)
  }

  private def isDefault(kind: String, a: Any): Boolean = a match {
    case null => true
    case s: String => kind == "string" && s.isEmpty
    case b: Array[Byte] => kind == "bytes" && b.isEmpty
    case b: Boolean => !b
    case f: Float => f == 0.0f
    case d: Double => d == 0.0
    case n => try numToLong(n) == 0L catch { case _: Exception => false }
  }

  private def writeTag(out: ByteArrayOutputStream, number: Int, wt: Int): Unit =
    writeVarint(out, ((number.toLong << 3) | wt))

  private def writeScalar(out: ByteArrayOutputStream, number: Int,
      kind: String, a: Any): Unit = kind match {
    case "string" =>
      val b = a.toString.getBytes(StandardCharsets.UTF_8)
      writeTag(out, number, 2); writeVarint(out, b.length.toLong); out.write(b)
    case "bytes" =>
      val b = a.asInstanceOf[Array[Byte]]
      writeTag(out, number, 2); writeVarint(out, b.length.toLong); out.write(b)
    case "double" | "fixed64" | "sfixed64" =>
      writeTag(out, number, 1); writeLe(out, scalarBits(kind, a), 8)
    case "float" | "fixed32" | "sfixed32" =>
      writeTag(out, number, 5); writeLe(out, scalarBits(kind, a), 4)
    case _ =>
      writeTag(out, number, 0); writeVarint(out, scalarBits(kind, a))
  }

  def encode(msg: PMessage, value: Map[String, Any]): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    msg.fields.foreach { f =>
      value.get(f.name).filter(_ != null).foreach { a =>
        f.tpe match {
          case PScalar(kind) =>
            if (!isDefault(kind, a)) writeScalar(out, f.number, kind, a)
          case m: PMessage =>
            val nested = encode(m, a.asInstanceOf[Map[String, Any]])
            writeTag(out, f.number, 2)
            writeVarint(out, nested.length.toLong)
            out.write(nested)
          case PRepeated(PScalar(kind)) if wireTypeOf(kind) != 2 =>
            // packed encoding for numeric repeated fields (proto3 default)
            val items = a.asInstanceOf[Seq[Any]]
            if (items.nonEmpty) {
              val body = new ByteArrayOutputStream()
              items.foreach { item =>
                kind match {
                  case "double" | "fixed64" | "sfixed64" =>
                    writeLe(body, scalarBits(kind, item), 8)
                  case "float" | "fixed32" | "sfixed32" =>
                    writeLe(body, scalarBits(kind, item), 4)
                  case _ => writeVarint(body, scalarBits(kind, item))
                }
              }
              val b = body.toByteArray
              writeTag(out, f.number, 2)
              writeVarint(out, b.length.toLong)
              out.write(b)
            }
          case PRepeated(elem) =>
            a.asInstanceOf[Seq[Any]].foreach { item =>
              elem match {
                case PScalar(kind) => writeScalar(out, f.number, kind, item)
                case m: PMessage =>
                  val nested = encode(m, item.asInstanceOf[Map[String, Any]])
                  writeTag(out, f.number, 2)
                  writeVarint(out, nested.length.toLong)
                  out.write(nested)
                case PRepeated(_) =>
                  throw new IllegalArgumentException("repeated repeated is not valid proto")
              }
            }
        }
      }
    }
    out.toByteArray
  }

  private final class Reader(b: Array[Byte], var pos: Int, val end: Int) {
    def atEnd: Boolean = pos >= end
    def readVarint(): Long = {
      var shift = 0; var res = 0L
      while (true) {
        require(pos < end, "truncated varint")
        val x = b(pos); pos += 1
        res |= (x & 0x7FL) << shift
        if ((x & 0x80) == 0) return res
        shift += 7
        require(shift < 64, "malformed varint")
      }
      res
    }
    def readLe(bytes: Int): Long = {
      require(bytes <= end - pos, s"truncated $bytes-byte field")
      var v = 0L; var i = 0
      while (i < bytes) { v |= (b(pos + i).toLong & 0xFF) << (8 * i); i += 1 }
      pos += bytes
      v
    }
    /** Length-delimited field length: read as Long FIRST, then bound.
      * `readVarint().toInt` would truncate a hostile 64-bit claim (e.g. a
      * multiple of 2^32 becomes 0) and silently decode corrupt input as an
      * empty string/bytes instead of refusing.
      */
    def readLen(): Int = {
      val v = readVarint()
      require(v >= 0 && v <= (end - pos).toLong, s"length $v overruns ${end - pos}-byte remainder")
      v.toInt
    }
    def readBytes(n: Int): Array[Byte] = {
      // subtraction form (pos + n overflows for hostile lengths), and a
      // hard bound BEFORE copyOfRange — which would otherwise ZERO-PAD
      // past the payload, i.e. allocate whatever a corrupt varint claims
      require(n >= 0 && n <= end - pos, s"length $n overruns ${end - pos}-byte remainder")
      val r = java.util.Arrays.copyOfRange(b, pos, pos + n); pos += n; r
    }
    def skip(wt: Int): Unit = wt match {
      case 0 => readVarint()
      case 1 => pos += 8
      case 2 =>
        // two statements NOT `pos += readLen()`: Scala loads the LHS
        // before evaluating the RHS, so the compound form would reset
        // pos to BEFORE the length varint readLen() just consumed and
        // desync the reader by the varint's width
        val n = readLen()
        pos += n
      case 5 => pos += 4
      case other => throw new IllegalArgumentException(s"unsupported wire type $other")
    }
  }

  private def scalarFromBits(kind: String, v: Long): Any = kind match {
    case "int32" | "enum"    => v.toInt
    case "sint32"            => unzigzag64(v).toInt
    case "sint64"            => unzigzag64(v)
    case "sfixed32"          => v.toInt
    case "fixed32" | "uint32" => v & 0xFFFFFFFFL
    case "bool"              => v != 0L
    case "float"             => java.lang.Float.intBitsToFloat(v.toInt)
    case "double"            => java.lang.Double.longBitsToDouble(v)
    case _                   => v // int64, uint64, fixed64, sfixed64
  }

  def defaultOf(t: PType): Any = t match {
    case PScalar("string") => ""
    case PScalar("bytes")  => Array.emptyByteArray
    case PScalar("bool")   => false
    case PScalar("float")  => 0.0f
    case PScalar("double") => 0.0
    case PScalar("int32" | "sint32" | "sfixed32" | "enum") => 0
    case PScalar(_)        => 0L
    case m: PMessage       => decode(m, Array.emptyByteArray)
    case PRepeated(_)      => Seq.empty[Any]
  }

  def decode(msg: PMessage, bytes: Array[Byte]): Map[String, Any] = {
    val byNumber = msg.fields.map(f => f.number -> f).toMap
    val acc = collection.mutable.Map.empty[String, Any]
    val repeated = collection.mutable.Map.empty[String, Vector[Any]]
    val r = new Reader(bytes, 0, bytes.length)
    while (!r.atEnd) {
      val tag = r.readVarint()
      val number = (tag >>> 3).toInt
      val wt = (tag & 7).toInt
      byNumber.get(number) match {
        case None => r.skip(wt)
        case Some(f) =>
          f.tpe match {
            case PScalar("string") => acc(f.name) =
              new String(r.readBytes(r.readLen()), StandardCharsets.UTF_8)
            case PScalar("bytes") => acc(f.name) = r.readBytes(r.readLen())
            case PScalar(kind) => acc(f.name) = wt match {
              case 0 => scalarFromBits(kind, r.readVarint())
              case 1 => scalarFromBits(kind, r.readLe(8))
              case 5 => scalarFromBits(kind, r.readLe(4))
              case other => throw new IllegalArgumentException(
                s"wire type $other for scalar $kind")
            }
            case m: PMessage =>
              acc(f.name) = decode(m, r.readBytes(r.readLen()))
            case PRepeated(elem) =>
              val cur = repeated.getOrElse(f.name, Vector.empty)
              elem match {
                case PScalar("string") =>
                  repeated(f.name) = cur :+
                    new String(r.readBytes(r.readLen()), StandardCharsets.UTF_8)
                case PScalar("bytes") =>
                  repeated(f.name) = cur :+ r.readBytes(r.readLen())
                case m: PMessage =>
                  repeated(f.name) = cur :+ decode(m, r.readBytes(r.readLen()))
                case PScalar(kind) if wt == 2 =>
                  // packed numeric
                  val len = r.readLen()
                  val stop = r.pos + len
                  var items = cur
                  while (r.pos < stop) {
                    items = items :+ (wireTypeOf(kind) match {
                      case 0 => scalarFromBits(kind, r.readVarint())
                      case 1 => scalarFromBits(kind, r.readLe(8))
                      case 5 => scalarFromBits(kind, r.readLe(4))
                    })
                  }
                  repeated(f.name) = items
                case PScalar(kind) =>
                  repeated(f.name) = cur :+ (wt match {
                    case 0 => scalarFromBits(kind, r.readVarint())
                    case 1 => scalarFromBits(kind, r.readLe(8))
                    case 5 => scalarFromBits(kind, r.readLe(4))
                    case other => throw new IllegalArgumentException(
                      s"wire type $other for repeated scalar $kind")
                  })
                case PRepeated(_) =>
                  throw new IllegalArgumentException("repeated repeated is not valid proto")
              }
          }
      }
    }
    repeated.foreach { case (k, v) => acc(k) = v }
    // proto3 defaults for absent fields
    msg.fields.foreach(f => if (!acc.contains(f.name)) acc(f.name) = defaultOf(f.tpe))
    acc.toMap
  }

  /** Map value → Spark Row matching [[sparkTypeOf]] (for decodeColumn). */
  def toRow(msg: PMessage, value: Map[String, Any]): Row =
    Row.fromSeq(msg.fields.map { f =>
      val a = value.getOrElse(f.name, defaultOf(f.tpe))
      convert(f.tpe, a)
    })

  private def convert(t: PType, a: Any): Any = t match {
    case m: PMessage  => toRow(m, a.asInstanceOf[Map[String, Any]])
    case PRepeated(e) => a.asInstanceOf[Seq[Any]].map(convert(e, _))
    case PScalar(_)   => a
  }
}

/** `proto:{...}` value serializer over [[ProtoSchema]]. */
final class ProtoValueSerializer(descriptor: String)
    extends ValueSerializer[Map[String, Any]] {

  @transient private lazy val message: ProtoSchema.PMessage =
    ProtoSchema.parse(descriptor)

  def scheme: String = s"proto:$descriptor"
  def sparkType: DataType = ProtoSchema.sparkTypeOf(message)

  def serialize(t: Map[String, Any]): Array[Byte] =
    ProtoSchema.encode(message, t)

  def deserialize(bytes: Array[Byte]): Option[Map[String, Any]] =
    parsed(bytes)(ProtoSchema.decode(message, _))

  def defaultValue: Map[String, Any] =
    ProtoSchema.decode(message, Array.emptyByteArray)

  /** Columnar decode BINARY → StructType row (UDF; no builtin proto codec). */
  def decodeColumn(c: Column): Column = {
    val desc = descriptor
    val fn = new UDF1[Array[Byte], Row] {
      @transient private lazy val m = ProtoSchema.parse(desc)
      override def call(b: Array[Byte]): Row =
        if (b == null) null else ProtoSchema.toRow(m, ProtoSchema.decode(m, b))
    }
    udf(fn, sparkType).apply(c)
  }

  /** Columnar encode keeps BINARY (row-side encode via [[serialize]]). */
  def encodeColumn(c: Column): Column = c

  /** Structural schema (SchemaDescriptors / ProtoMessageValueAccessor
    * analog): top-level field names with their descriptor types.
    */
  def fields: Seq[(String, String)] = message.fields.map { f =>
    f.name -> (f.tpe match {
      case ProtoSchema.PScalar(k)   => k
      case _: ProtoSchema.PMessage  => "message"
      case ProtoSchema.PRepeated(_) => "repeated"
    })
  }
}
