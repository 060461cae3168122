package graft.core

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.SparkSpec.spark.implicits._

/** Proto scheme: wire-format known-answer vectors (from the public
  * protobuf encoding documentation), round trips over every field kind,
  * proto3 default handling, unknown-field skipping, and the columnar
  * StructType decode.
  */
class ProtoSpec extends SparkSpec {

  private def hex(b: Array[Byte]): String =
    b.map(x => f"${x & 0xff}%02x").mkString

  test("known-answer wire vectors from the protobuf encoding spec") {
    // Test1 { int32 a = 1; } with a = 150  ->  08 96 01
    val t1 = new ProtoValueSerializer("{1:a=int32}")
    assert(hex(t1.serialize(Map("a" -> 150))) == "089601")
    // Test2 { string b = 2; } with b = "testing" -> 12 07 "testing"
    val t2 = new ProtoValueSerializer("{2:b=string}")
    assert(hex(t2.serialize(Map("b" -> "testing"))) == "120774657374696e67")
    // Test3 { Test1 c = 3; } with c.a = 150 -> 1a 03 08 96 01
    val t3 = new ProtoValueSerializer("{3:c={1:a=int32}}")
    assert(hex(t3.serialize(Map("c" -> Map("a" -> 150)))) == "1a03089601")
    // packed repeated: Test4 { repeated int32 d = 4 } with [3,270,86942]
    // -> 22 06 03 8e 02 9e a7 05
    val t4 = new ProtoValueSerializer("{4:d=repeated int32}")
    assert(hex(t4.serialize(Map("d" -> Seq(3, 270, 86942)))) == "2206038e029ea705")
    // zigzag: sint32 -1 -> 1, -2 -> 3 (field 1 -> tag 08)
    val tz = new ProtoValueSerializer("{1:z=sint32}")
    assert(hex(tz.serialize(Map("z" -> -1))) == "0801")
    assert(hex(tz.serialize(Map("z" -> -2))) == "0803")
  }

  test("64-bit length claims refuse instead of truncating to Int") {
    // a claimed length of exactly 2^32 is a multiple of 2^32: naive
    // `readVarint().toInt` truncates it to 0 and silently decodes corrupt
    // input as an EMPTY string instead of refusing (deserialize -> None)
    val claim32 = Array(0x80, 0x80, 0x80, 0x80, 0x10).map(_.toByte) // varint 2^32
    val ser = new ProtoValueSerializer("{2:b=string}")
    assert(ser.deserialize(Array(0x12.toByte) ++ claim32).isEmpty)
    // same claim on an UNKNOWN field's wire skip must refuse too
    val ser2 = new ProtoValueSerializer("{1:a=int32}")
    assert(ser2.deserialize(Array(0x12.toByte) ++ claim32).isEmpty)
    // and on a packed repeated length
    val ser3 = new ProtoValueSerializer("{2:d=repeated int32}")
    assert(ser3.deserialize(Array(0x12.toByte) ++ claim32).isEmpty)
    // a legitimate zero-length string still decodes as empty, not None
    assert(ser.deserialize(Array(0x12, 0x00).map(_.toByte)).exists(_("b") == ""))
  }

  test("unknown length-delimited fields skip their length varint AND " +
      "payload (reader must not desync by the varint's width)") {
    // writer {11:by=bytes;2:i64=int64}, reader {2:i64=int64}: the skip of
    // field 11 must consume tag + 1-byte length varint + 2 payload bytes;
    // a skip that re-reads from before the varint lands mid-payload and
    // the next "tag" is garbage (the regression was `pos += readLen()`,
    // whose LHS is loaded before the RHS consumes the varint)
    val wide = new ProtoValueSerializer("{11:by=bytes;2:i64=int64}")
    val bytes = wide.serialize(Map(
      "by" -> Array[Byte](0xB3.toByte, 0x7E), "i64" -> 42L))
    val narrow = new ProtoValueSerializer("{2:i64=int64}")
    assert(narrow.deserialize(bytes).exists(_("i64") == 42L))
  }

  test("round trip over every field kind incl. negatives and nesting") {
    val desc = "{1:i32=int32;2:i64=int64;3:u64=uint64;4:s32=sint32;5:s64=sint64;" +
      "6:f32=fixed32;7:f64=fixed64;8:sf32=sfixed32;9:sf64=sfixed64;" +
      "10:b=bool;11:e=enum;12:f=float;13:d=double;14:s=string;15:by=bytes;" +
      "16:tags=repeated string;17:nums=repeated sint64;" +
      "18:msgs=repeated {1:x=int32};19:nested={1:lang=string;2:deep={1:q=int64}}}"
    val ser = new ProtoValueSerializer(desc)
    val value = Map(
      "i32" -> -42, "i64" -> -1234567890123L, "u64" -> Long.MaxValue,
      "s32" -> -7, "s64" -> -99999999999L,
      "f32" -> 4294967295L, "f64" -> -5L, "sf32" -> -12, "sf64" -> -34L,
      "b" -> true, "e" -> 3, "f" -> -1.5f, "d" -> math.E,
      "s" -> "héllo", "by" -> Array[Byte](0, 1, -2),
      "tags" -> Seq("a", "", "c"), "nums" -> Seq(-1L, 0L, 5L),
      "msgs" -> Seq(Map("x" -> 1), Map("x" -> -2)),
      "nested" -> Map("lang" -> "cs", "deep" -> Map("q" -> 9L)))
    val decoded = ser.deserialize(ser.serialize(value)).get
    def normalize(m: Map[String, Any]): Map[String, Any] = m.map {
      case (k, b: Array[Byte]) => k -> b.toSeq
      case (k, s: Seq[_]) => k -> s.map {
        case mm: Map[_, _] => normalize(mm.asInstanceOf[Map[String, Any]])
        case x => x
      }
      case (k, mm: Map[_, _]) => k -> normalize(mm.asInstanceOf[Map[String, Any]])
      case kv => kv
    }
    // empty-string element of `tags` is a valid length-0 element (repeated
    // elements are always written); compare field by field
    assert(normalize(decoded) == normalize(value))
  }

  test("proto3 defaults: zero values are omitted on the wire and restored") {
    val ser = new ProtoValueSerializer("{1:a=int32;2:s=string;3:t=repeated int32}")
    val bytes = ser.serialize(Map("a" -> 0, "s" -> "", "t" -> Seq.empty[Int]))
    assert(bytes.isEmpty, "all-default message must encode to zero bytes")
    val back = ser.deserialize(bytes).get
    assert(back("a") == 0 && back("s") == "" &&
      back("t").asInstanceOf[Seq[_]].isEmpty)
  }

  test("unknown fields on the wire are skipped") {
    val writer = new ProtoValueSerializer("{1:a=int32;2:s=string;3:d=double}")
    val reader = new ProtoValueSerializer("{2:s=string}")
    val bytes = writer.serialize(Map("a" -> 5, "s" -> "keep", "d" -> 1.25))
    assert(reader.deserialize(bytes).get("s") == "keep")
  }

  test("scheme registry resolves proto URIs; repository parses proto schemes") {
    val ser = ValueSerializer.of("proto:{1:id=int64;2:name=string}")
    assert(ser.isInstanceOf[ProtoValueSerializer])
    val repo = Repository.parse(
      """entities { device { attributes {
        |  "profile" { scheme: "proto:{1:id=int64;2:name=string}" }
        |} } }""".stripMargin)
    val attr = repo.entity("device").attribute("profile").get
    assert(attr.serializer.isInstanceOf[ProtoValueSerializer])
    assert(attr.serializer.asInstanceOf[ProtoValueSerializer].fields ==
      Seq("id" -> "int64", "name" -> "string"))
  }

  test("columnar decode yields the mapped StructType") {
    val ser = new ProtoValueSerializer(
      "{1:id=int64;2:name=string;3:scores=repeated double;4:meta={1:lang=string}}")
    val rows = Seq(
      Map("id" -> 1L, "name" -> "a", "scores" -> Seq(1.0, 2.5),
        "meta" -> Map("lang" -> "en")),
      Map("id" -> 2L, "name" -> "", "scores" -> Seq.empty[Double],
        "meta" -> Map("lang" -> "")))
    val df = rows.map(r => Tuple1(ser.serialize(r))).toDF("bin")
    val out = df.select(ser.decodeColumn(col("bin")).as("v"))
      .select(col("v.id"), col("v.name"), col("v.scores"), col("v.meta.lang"))
      .collect()
    assert(out(0).getLong(0) == 1L && out(0).getString(1) == "a")
    assert(out(0).getSeq[Double](2) == Seq(1.0, 2.5))
    assert(out(0).getString(3) == "en")
    assert(out(1).getLong(0) == 2L && out(1).getString(1) == "")
    assert(out(1).getSeq[Double](2).isEmpty && out(1).getString(3) == "")
  }
}
