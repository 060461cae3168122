package graft.core

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.SparkSpec.spark.implicits._

/** Columnar codec ⇔ typed row codec agreement for every scheme — including
  * the traps the first cut had: negative ints/longs through the hex
  * round-trip, IEEE-754 float/double bit patterns, and encodeColumn of
  * sign-extended values.
  */
class CodecSpec extends SparkSpec {

  test("long columnar codec round-trips, negatives and extremes included") {
    val s = ValueSerializer.LongSerializer
    val vals = Seq(0L, 1L, -1L, -2L, 42L, -1234567890123L,
      Long.MaxValue, Long.MinValue)
    val df = vals.map(v => Tuple1(s.serialize(v))).toDF("bin")
    val decoded = df.select(s.decodeColumn(col("bin")).as("v"))
      .collect().map(_.getLong(0)).toSeq
    assert(decoded == vals)
    val encoded = vals.toDF("v")
      .select(s.encodeColumn(col("v")).as("bin"))
      .collect().map(_.getAs[Array[Byte]](0).toSeq).toSeq
    assert(encoded == vals.map(s.serialize(_).toSeq))
  }

  test("int columnar codec round-trips, negatives and extremes included") {
    val s = ValueSerializer.IntSerializer
    val vals = Seq(0, 1, -1, -2, 42, -123456789, Int.MaxValue, Int.MinValue)
    val df = vals.map(v => Tuple1(s.serialize(v))).toDF("bin")
    val decoded = df.select(s.decodeColumn(col("bin")).as("v"))
      .collect().map(_.getInt(0)).toSeq
    assert(decoded == vals)
    val encoded = vals.toDF("v")
      .select(s.encodeColumn(col("v")).as("bin"))
      .collect().map(_.getAs[Array[Byte]](0).toSeq).toSeq
    assert(encoded == vals.map(s.serialize(_).toSeq))
  }

  test("double columnar codec preserves IEEE-754 bit patterns") {
    val s = ValueSerializer.DoubleSerializer
    val vals = Seq(0.0, -0.0, 1.5, -2.25, math.Pi, Double.MinPositiveValue,
      Double.MaxValue, Double.NegativeInfinity)
    val df = vals.map(v => Tuple1(s.serialize(v))).toDF("bin")
    val decoded = df.select(s.decodeColumn(col("bin")).as("v"))
      .collect().map(_.getDouble(0)).toSeq
    assert(decoded.map(java.lang.Double.doubleToRawLongBits) ==
      vals.map(java.lang.Double.doubleToRawLongBits))
    val encoded = vals.toDF("v")
      .select(s.encodeColumn(col("v")).as("bin"))
      .collect().map(_.getAs[Array[Byte]](0).toSeq).toSeq
    assert(encoded == vals.map(s.serialize(_).toSeq))
  }

  test("float columnar codec preserves IEEE-754 bit patterns") {
    val s = ValueSerializer.FloatSerializer
    val vals = Seq(0.0f, -0.0f, 1.5f, -2.25f, Float.MaxValue,
      Float.NegativeInfinity)
    val df = vals.map(v => Tuple1(s.serialize(v))).toDF("bin")
    val decoded = df.select(s.decodeColumn(col("bin")).as("v"))
      .collect().map(_.getFloat(0)).toSeq
    assert(decoded.map(java.lang.Float.floatToRawIntBits) ==
      vals.map(java.lang.Float.floatToRawIntBits))
    val encoded = vals.toDF("v")
      .select(s.encodeColumn(col("v")).as("bin"))
      .collect().map(_.getAs[Array[Byte]](0).toSeq).toSeq
    assert(encoded == vals.map(s.serialize(_).toSeq))
  }

  test("string/json/bytes columnar codecs round-trip") {
    for (s <- Seq(ValueSerializer.StringSerializer, ValueSerializer.JsonSerializer)) {
      val vals = Seq("", "hello", """{"a":1}""", "ünïcødé")
      val df = vals.map(v => Tuple1(s.serialize(v))).toDF("bin")
      val decoded = df.select(s.decodeColumn(col("bin")).as("v"))
        .collect().map(_.getString(0)).toSeq
      assert(decoded == vals)
      val enc = vals.toDF("v").select(s.encodeColumn(col("v")).as("bin"))
        .collect().map(_.getAs[Array[Byte]](0).toSeq).toSeq
      assert(enc == vals.map(s.serialize(_).toSeq))
    }
    val bs = ValueSerializer.BytesSerializer
    val raw = Seq(Array[Byte](1, 2, -3), Array.emptyByteArray)
    val rdf = raw.map(Tuple1(_)).toDF("bin")
    assert(rdf.select(bs.decodeColumn(col("bin"))).collect()
      .map(_.getAs[Array[Byte]](0).toSeq).toSeq == raw.map(_.toSeq))
  }
}
