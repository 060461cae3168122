package graft.core

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.SparkSpec.spark.implicits._

/** proto-json scheme: canonical proto3 JSON forms, round trips over
  * every field kind, interchangeability with the binary proto codec,
  * registry/repository resolution, and columnar decode.
  */
class ProtoJsonSpec extends SparkSpec {

  private def normalize(m: Map[String, Any]): Map[String, Any] = m.map {
    case (k, b: Array[Byte]) => k -> b.toSeq
    case (k, s: Seq[_]) => k -> s.map {
      case mm: Map[_, _] => normalize(mm.asInstanceOf[Map[String, Any]])
      case b: Array[Byte] => b.toSeq
      case x => x
    }
    case (k, mm: Map[_, _]) => k -> normalize(mm.asInstanceOf[Map[String, Any]])
    case kv => kv
  }

  test("canonical proto3 JSON forms") {
    val ser = new ProtoJsonValueSerializer(
      "{1:big=int64;2:by=bytes;3:d=double;4:s=string;5:n=int32}")
    val json = new String(ser.serialize(Map(
      "big" -> 1234567890123456789L, "by" -> Array[Byte](1, 2, 3),
      "d" -> Double.NaN, "s" -> "x", "n" -> 7)), StandardCharsets.UTF_8)
    // 64-bit as STRING (json numbers corrupt past 2^53), bytes base64,
    // NaN as string, 32-bit as plain number
    assert(json.contains("\"big\":\"1234567890123456789\""), json)
    assert(json.contains("\"by\":\"AQID\""), json)
    assert(json.contains("\"d\":\"NaN\""), json)
    assert(json.contains("\"s\":\"x\""), json)
    assert(json.contains("\"n\":7"), json)
    // defaults are omitted entirely
    val empty = new String(ser.serialize(Map(
      "big" -> 0L, "by" -> Array.emptyByteArray, "d" -> 0.0,
      "s" -> "", "n" -> 0)), StandardCharsets.UTF_8)
    assert(empty == "{}", empty)
  }

  test("round trip over every field kind incl. negatives and nesting") {
    val desc = "{1:i32=int32;2:i64=int64;3:u64=uint64;4:s32=sint32;5:s64=sint64;" +
      "6:f32=fixed32;7:f64=fixed64;8:sf32=sfixed32;9:sf64=sfixed64;" +
      "10:b=bool;11:e=enum;12:f=float;13:d=double;14:s=string;15:by=bytes;" +
      "16:tags=repeated string;17:nums=repeated sint64;" +
      "18:msgs=repeated {1:x=int32};19:nested={1:lang=string;2:deep={1:q=int64}}}"
    val ser = new ProtoJsonValueSerializer(desc)
    val value = Map(
      "i32" -> -42, "i64" -> -1234567890123L, "u64" -> Long.MaxValue,
      "s32" -> -7, "s64" -> -99999999999L,
      "f32" -> 4294967295L, "f64" -> -5L, "sf32" -> -12, "sf64" -> -34L,
      "b" -> true, "e" -> 3, "f" -> -1.5f, "d" -> math.E,
      "s" -> "héllo \"quoted\"", "by" -> Array[Byte](0, 1, -2),
      "tags" -> Seq("a", "", "c"), "nums" -> Seq(-1L, 0L, 5L),
      "msgs" -> Seq(Map("x" -> 1), Map("x" -> -2)),
      "nested" -> Map("lang" -> "cs", "deep" -> Map("q" -> 9L)))
    val back = ser.deserialize(ser.serialize(value)).get
    // fill defaults on the reference side the same way proto3 read does
    val binary = new ProtoValueSerializer(desc)
    val expected = binary.deserialize(binary.serialize(value)).get
    assert(normalize(back) == normalize(expected))
  }

  test("binary and json schemes are interchangeable per value") {
    val desc = "{1:id=int64;2:name=string;3:tags=repeated string}"
    val bin = new ProtoValueSerializer(desc)
    val js = new ProtoJsonValueSerializer(desc)
    val v = Map("id" -> 12L, "name" -> "n", "tags" -> Seq("t1", "t2"))
    assert(normalize(js.deserialize(js.serialize(v)).get) ==
      normalize(bin.deserialize(bin.serialize(v)).get))
    assert(normalize(js.defaultValue) == normalize(bin.defaultValue))
  }

  test("unknown json fields ignored; absent fields filled with defaults") {
    val ser = new ProtoJsonValueSerializer("{1:a=int32;2:s=string}")
    val back = ser.deserialize(
      """{"s":"keep","junk":123,"deep":{"x":1}}""".getBytes("UTF-8")).get
    assert(back == Map("a" -> 0, "s" -> "keep"))
  }

  test("scheme registry and repository resolve proto-json URIs") {
    val ser = ValueSerializer.of("proto-json:{1:id=int64;2:name=string}")
    assert(ser.isInstanceOf[ProtoJsonValueSerializer])
    val repo = Repository.parse(
      """entities { device { attributes {
        |  "profile" { scheme: "proto-json:{1:id=int64;2:name=string}" }
        |} } }""".stripMargin)
    val attr = repo.entity("device").attribute("profile").get
    assert(attr.serializer.isInstanceOf[ProtoJsonValueSerializer])
    assert(attr.serializer.asInstanceOf[ProtoJsonValueSerializer].fields ==
      Seq("id" -> "int64", "name" -> "string"))
  }

  test("columnar decode yields the mapped StructType") {
    val ser = new ProtoJsonValueSerializer(
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
