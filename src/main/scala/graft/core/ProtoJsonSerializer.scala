package graft.core

import java.nio.charset.StandardCharsets
import java.util.Base64

import org.apache.spark.sql.{Column, Row}
import org.apache.spark.sql.api.java.UDF1
import org.apache.spark.sql.functions.udf
import org.apache.spark.sql.types.DataType

import graft.service.Json

/** proto-json value scheme — the reference's JSON proto serializer
  * (reference: scheme/proto/.../JsonProtoSerializerFactory.java:46 —
  * the same message model as `proto:`, but the wire representation is
  * protobuf's canonical JSON mapping instead of the binary format).
  *
  * The descriptor DSL is shared with [[ProtoValueSerializer]]; only the
  * byte representation differs. The JSON mapping follows the public
  * proto3 JSON spec:
  *
  *  - 64-bit integers (`int64`/`uint64`/`fixed64`/`sfixed64`/`sint64`)
  *    are encoded as decimal STRINGS (JSON numbers are IEEE doubles and
  *    would corrupt past 2^53);
  *  - `bytes` encode as base64 strings;
  *  - non-finite floats/doubles encode as "NaN"/"Infinity"/"-Infinity";
  *  - fields at their proto3 default are omitted on write and restored
  *    on read (same default model as the binary codec — [[ProtoSchema
  *    .defaultOf]] is shared);
  *  - unknown JSON fields are ignored on read.
  *
  * Values are `Map[String, Any]` exactly as in the binary scheme, so the
  * two serializers are drop-in interchangeable per attribute family.
  */
object ProtoJson {
  import ProtoSchema._

  private val Long64 = Set("int64", "uint64", "fixed64", "sfixed64", "sint64")

  def render(msg: PMessage, value: Map[String, Any]): String =
    msg.fields.flatMap { f =>
      value.get(f.name).filter(_ != null).flatMap(a => renderField(f.tpe, a))
        .map(j => Json.quote(f.name) + ":" + j)
    }.mkString("{", ",", "}")

  /** None = field at its proto3 default, omitted from the object. */
  private def renderField(t: PType, a: Any): Option[String] = t match {
    case m: PMessage =>
      Some(render(m, a.asInstanceOf[Map[String, Any]]))
    case PRepeated(e) =>
      val items = a.asInstanceOf[Seq[Any]]
      if (items.isEmpty) None
      // array ELEMENTS always render, defaults included
      else Some(items.map(item => renderField(e, item)
        .getOrElse(renderScalarAny(e, item))).mkString("[", ",", "]"))
    case PScalar(kind) =>
      if (isJsonDefault(kind, a)) None else Some(renderScalar(kind, a))
  }

  private def renderScalarAny(t: PType, a: Any): String = t match {
    case PScalar(kind) => renderScalar(kind, a)
    case m: PMessage   => render(m, a.asInstanceOf[Map[String, Any]])
    case PRepeated(_) =>
      throw new IllegalArgumentException("repeated repeated is not valid proto")
  }

  private def isJsonDefault(kind: String, a: Any): Boolean = a match {
    case null           => true
    case s: String      => kind == "string" && s.isEmpty
    case b: Array[Byte] => kind == "bytes" && b.isEmpty
    case b: Boolean     => !b
    case f: Float       => f == 0.0f
    case d: Double      => d == 0.0
    case n: Number      => n.longValue() == 0L
    case _              => false
  }

  private def renderScalar(kind: String, a: Any): String = kind match {
    case "string" => Json.quote(a.toString)
    case "bytes" =>
      Json.quote(Base64.getEncoder.encodeToString(a.asInstanceOf[Array[Byte]]))
    case "bool" => a.toString
    case "float" | "double" =>
      val d = toDouble(a)
      if (d.isNaN) "\"NaN\""
      else if (d.isPosInfinity) "\"Infinity\""
      else if (d.isNegInfinity) "\"-Infinity\""
      else if (kind == "float") toDouble(a).toFloat.toString
      else d.toString
    case k if Long64.contains(k) => Json.quote(toLong(a).toString)
    case _ => toLong(a).toString // 32-bit ints, enum
  }

  /** Fill a parsed JSON object into the descriptor's value shape:
    * coerce types, fill proto3 defaults for absent fields, drop unknowns.
    */
  def absorb(msg: PMessage, j: Map[String, Any]): Map[String, Any] =
    msg.fields.map { f =>
      f.name -> j.get(f.name).filter(_ != null).map(coerce(f.tpe, _))
        .getOrElse(defaultOf(f.tpe))
    }.toMap

  private def coerce(t: PType, v: Any): Any = t match {
    case m: PMessage  => absorb(m, v.asInstanceOf[Map[String, Any]])
    case PRepeated(e) => v.asInstanceOf[Seq[Any]].map(coerce(e, _))
    case PScalar(kind) => kind match {
      case "string" => v.toString
      case "bytes"  => Base64.getDecoder.decode(v.toString)
      case "bool" => v match {
        case b: Boolean => b
        case s: String  => s.toBoolean
        case n: Number  => n.longValue() != 0L
      }
      case "float"  => toDouble(v).toFloat
      case "double" => toDouble(v)
      case "int32" | "sint32" | "sfixed32" | "enum" => toLong(v).toInt
      case _ => toLong(v) // 64-bit kinds + uint32/fixed32 (long-typed)
    }
  }

  private def toDouble(v: Any): Double = v match {
    case d: Double       => d
    case f: Float        => f.toDouble
    case n: Number       => n.doubleValue()
    case "NaN"           => Double.NaN
    case "Infinity"      => Double.PositiveInfinity
    case "-Infinity"     => Double.NegativeInfinity
    case s: String       => s.toDouble
    case other => throw new IllegalArgumentException(s"not a number: $other")
  }

  private def toLong(v: Any): Long = v match {
    case l: Long   => l
    case i: Int    => i.toLong
    case d: Double => d.toLong
    case s: String =>
      // signed first (our renderer prints Long bits); unsigned fallback
      // accepts external proto3 writers printing uint64 above 2^63-1
      try s.toLong
      catch { case _: NumberFormatException => java.lang.Long.parseUnsignedLong(s) }
    case n: Number => n.longValue()
    case other => throw new IllegalArgumentException(s"not an integer: $other")
  }
}

/** `proto-json:{...}` value serializer over the shared descriptor DSL. */
final class ProtoJsonValueSerializer(descriptor: String)
    extends ValueSerializer[Map[String, Any]] {

  @transient private lazy val message: ProtoSchema.PMessage =
    ProtoSchema.parse(descriptor)

  def scheme: String = s"proto-json:$descriptor"
  def sparkType: DataType = ProtoSchema.sparkTypeOf(message)

  def serialize(t: Map[String, Any]): Array[Byte] =
    ProtoJson.render(message, t).getBytes(StandardCharsets.UTF_8)

  def deserialize(bytes: Array[Byte]): Option[Map[String, Any]] =
    parsed(bytes) { b =>
      val s = new String(b, StandardCharsets.UTF_8).trim
      ProtoJson.absorb(message,
        if (s.isEmpty) Map.empty else Json.parseObject(s))
    }

  def defaultValue: Map[String, Any] = ProtoJson.absorb(message, Map.empty)

  /** Columnar decode BINARY(JSON) → StructType row. */
  def decodeColumn(c: Column): Column = {
    val desc = descriptor
    val fn = new UDF1[Array[Byte], Row] {
      @transient private lazy val m = ProtoSchema.parse(desc)
      override def call(b: Array[Byte]): Row =
        if (b == null) null
        else {
          val s = new String(b, StandardCharsets.UTF_8).trim
          ProtoSchema.toRow(m, ProtoJson.absorb(m,
            if (s.isEmpty) Map.empty else Json.parseObject(s)))
        }
    }
    udf(fn, sparkType).apply(c)
  }

  def encodeColumn(c: Column): Column = c

  /** Structural schema, identical to the binary scheme's. */
  def fields: Seq[(String, String)] = message.fields.map { f =>
    f.name -> (f.tpe match {
      case ProtoSchema.PScalar(k)   => k
      case _: ProtoSchema.PMessage  => "message"
      case ProtoSchema.PRepeated(_) => "repeated"
    })
  }
}
