package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** The reference's deserialization contract (core ValueSerializer.java:
  * 40-46): "If the deserialization fails the returned value is empty."
  * Corrupt bytes yield None from EVERY serializer — never an exception —
  * and valid bytes still round-trip.
  */
class DeserializeContractSpec extends AnyFunSuite {

  private val garbage = Array[Byte](0x7F, -1, 3) // wrong length AND wrong shape

  test("fixed-width numerics: wrong-length payload is None, not a throw") {
    assert(ValueSerializer.LongSerializer.deserialize(garbage).isEmpty)
    assert(ValueSerializer.IntSerializer.deserialize(garbage).isEmpty)
    assert(ValueSerializer.DoubleSerializer.deserialize(garbage).isEmpty)
    assert(ValueSerializer.FloatSerializer.deserialize(garbage).isEmpty)
    assert(ValueSerializer.LongSerializer.deserialize(
      ValueSerializer.LongSerializer.serialize(-42L)).contains(-42L))
  }

  test("proto: truncated and huge-length-claim payloads are None") {
    val ser = new ProtoValueSerializer("{1:id=int64;2:name=string}")
    val ok = ser.serialize(Map("id" -> 7L, "name" -> "x"))
    assert(ser.deserialize(ok.take(ok.length - 1)).isEmpty)
    // field 2 wt 2 with a ~2^32 claimed length and no bytes behind it
    assert(ser.deserialize(
      Array(0x12, 0xFF, 0xFF, 0xFF, 0xFF, 0x07).map(_.toByte)).isEmpty)
    assert(ser.deserialize(ok).exists(_("id") == 7L))
  }

  test("avro: corrupt record bytes are None") {
    val ser = new AvroValueSerializer(
      """{"type":"record","name":"t","fields":[
        |{"name":"id","type":"long"},{"name":"s","type":"string"}]}"""
        .stripMargin)
    val rec = new org.apache.avro.generic.GenericData.Record(
      new org.apache.avro.Schema.Parser().parse(ser.scheme.stripPrefix("avro:")))
    rec.put("id", 5L); rec.put("s", "hello")
    val ok = ser.serialize(rec)
    assert(ser.deserialize(ok.take(1)).isEmpty)
    assert(ser.deserialize(garbage).isEmpty)
    assert(ser.deserialize(ok).exists(_.get("id") == 5L))
  }

  test("proto-json: non-JSON bytes are None") {
    val ser = new ProtoJsonValueSerializer("{1:id=int64}")
    assert(ser.deserialize("{nope".getBytes("UTF-8")).isEmpty)
    val ok = ser.serialize(Map("id" -> 9L))
    assert(ser.deserialize(ok).exists(_("id") == 9L))
  }
}
