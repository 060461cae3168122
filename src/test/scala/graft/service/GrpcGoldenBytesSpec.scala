package graft.service

import org.scalatest.funsuite.AnyFunSuite

import graft.core.ProtoSchema

/** GOLDEN-BYTES interop fixtures: every byte below is derived BY HAND from
  * the public protobuf wire format spec (encoding docs: tag = field<<3 |
  * wireType; wireType 0 = varint, 2 = length-delimited; varint =
  * little-endian 7-bit groups, msb = continuation) and the gRPC
  * PROTOCOL-HTTP2 spec (Length-Prefixed-Message, grpc-timeout). They are
  * EXTERNAL constants: GrpcServerSpec drives real frames through
  * GrpcTestClient, but client and codec share an author, so a shared
  * misreading of the wire spec would pass there and fail here.
  *
  * Field numbers match the reference rpc.proto (Ingest:23 uuid=1 entity=2
  * attribute=3 key=4 value=5 delete=6 stamp=7; GetResponse:178 status=1
  * statusMessage=2 value=3 stamp=4).
  */
class GrpcGoldenBytesSpec extends AnyFunSuite {

  private def hex(bs: Array[Byte]): String =
    bs.map(b => f"${b & 0xff}%02x").mkString(" ")

  private def bytesOf(xs: Int*): Array[Byte] = xs.map(_.toByte).toArray

  test("Ingest encodes to the hand-derived wire bytes (and decodes back)") {
    val msg = Map(
      "uuid" -> "u-1", "entity" -> "gw", "attribute" -> "status",
      "key" -> "k1", "value" -> bytesOf(0xDE, 0xAD, 0xBE, 0xEF),
      "delete" -> true, "stamp" -> 1234567890123L, "transactionId" -> "")
    // field 1 (uuid, string): tag 1<<3|2 = 0x0a, len 3, "u-1"
    // field 2 (entity):       tag 0x12, len 2, "gw"
    // field 3 (attribute):    tag 0x1a, len 6, "status"
    // field 4 (key):          tag 0x22, len 2, "k1"
    // field 5 (value, bytes): tag 0x2a, len 4, de ad be ef
    // field 6 (delete, bool): tag 6<<3|0 = 0x30, 01
    // field 7 (stamp=1234567890123 = 0x11f71fb04cb): tag 0x38, varint
    //   7-bit groups LSB-first: 4b, 09, 6c, 0f, 77, 23 → with
    //   continuation bits: cb 89 ec 8f f7 23
    // field 8 (transactionId = "" default): ABSENT per proto3
    val golden = bytesOf(
      0x0a, 0x03, 'u', '-', '1',
      0x12, 0x02, 'g', 'w',
      0x1a, 0x06, 's', 't', 'a', 't', 'u', 's',
      0x22, 0x02, 'k', '1',
      0x2a, 0x04, 0xDE, 0xAD, 0xBE, 0xEF,
      0x30, 0x01,
      0x38, 0xcb, 0x89, 0xec, 0x8f, 0xf7, 0x23)
    assert(hex(ProtoSchema.encode(GrpcService.Ingest, msg)) == hex(golden))
    val back = ProtoSchema.decode(GrpcService.Ingest, golden)
    assert(back("uuid") == "u-1" && back("stamp") == 1234567890123L &&
      back("delete") == true)
    assert(hex(back("value").asInstanceOf[Array[Byte]]) == "de ad be ef")
  }

  test("2-byte length varint: a 300-char string's length encodes ac 02") {
    val s300 = "x" * 300
    val enc = ProtoSchema.encode(GrpcService.CommitRequest,
      Map("transactionId" -> s300))
    // tag 0x0a, len 300 = 0b10_0101100 → varint ac 02, then 300 bytes
    assert(enc.length == 3 + 300)
    assert((enc(0) & 0xff) == 0x0a)
    assert((enc(1) & 0xff) == 0xac && (enc(2) & 0xff) == 0x02)
    assert(ProtoSchema.decode(GrpcService.CommitRequest, enc)("transactionId") == s300)
  }

  test("uint64 top-bit values round-trip as the 10-byte varint") {
    // stamp = 2^64-1 (Long -1): ff ff ff ff ff ff ff ff ff 01
    val enc = ProtoSchema.encode(GrpcService.GetResponse,
      Map("status" -> 200L, "stamp" -> -1L))
    val goldenTail = bytesOf(0x20, 0xff, 0xff, 0xff, 0xff, 0xff, 0xff,
      0xff, 0xff, 0xff, 0x01)
    assert(hex(enc).endsWith(hex(goldenTail)),
      s"expected trailing ${hex(goldenTail)} in ${hex(enc)}")
    assert(ProtoSchema.decode(GrpcService.GetResponse, enc)("stamp") == -1L)
  }

  test("packed repeated numerics use one length-delimited body (proto3)") {
    // synthetic descriptor — rpc.proto's used surface has no repeated
    // scalar numeric field, but the codec must still speak proto3's
    // packed default for one: tag 0x0a (field 1, wire type 2),
    // len 4, varints 01 / ac 02 / 7f
    val m = ProtoSchema.parse("{1:xs=repeated uint64}")
    val golden = bytesOf(0x0a, 0x04, 0x01, 0xac, 0x02, 0x7f)
    assert(hex(ProtoSchema.encode(m, Map("xs" -> Seq(1L, 300L, 127L)))) ==
      hex(golden))
    assert(ProtoSchema.decode(m, golden)("xs") == Seq(1L, 300L, 127L))
  }

  test("repeated strings are NOT packed: one tag per element") {
    // ScanRequest.attribute (field 2, string): length-delimited fields
    // never pack — tag 0x12 repeats per element
    val enc = ProtoSchema.encode(GrpcService.ScanRequest,
      Map("entity" -> "e", "attribute" -> Seq("a", "bb")))
    val golden = bytesOf(
      0x0a, 0x01, 'e',
      0x12, 0x01, 'a',
      0x12, 0x02, 'b', 'b')
    assert(hex(enc) == hex(golden))
  }

  test("Length-Prefixed-Message framing: flag byte + 4-byte BE length") {
    val p3 = bytesOf(0x01, 0x02, 0x03)
    assert(hex(GrpcWire.frame(p3)) == "00 00 00 00 03 01 02 03")
    val p300 = Array.fill[Byte](300)(0x41)
    val f = GrpcWire.frame(p300)
    assert(hex(f.take(5)) == "00 00 00 01 2c") // 300 = 0x012c
    // reassembly is chunking-independent: feed the golden frame
    // byte-by-byte and get exactly the payload back
    val r = new GrpcWire.FrameReader()
    val out = f.flatMap(b => r.feed(Array(b)))
    assert(out.length == 1 && hex(out.head) == hex(p300))
  }

  test("grpc-timeout values parse per spec and saturate instead of wrap") {
    assert(GrpcWire.parseGrpcTimeoutNanos("1S").contains(1000000000L))
    assert(GrpcWire.parseGrpcTimeoutNanos("100m").contains(100000000L))
    assert(GrpcWire.parseGrpcTimeoutNanos("250u").contains(250000L))
    assert(GrpcWire.parseGrpcTimeoutNanos("7n").contains(7L))
    assert(GrpcWire.parseGrpcTimeoutNanos("2H").contains(7200000000000L))
    // 8-digit hours: 99999999 * 3.6e12 ns overflows int64 — must clamp
    assert(GrpcWire.parseGrpcTimeoutNanos("99999999H").contains(Long.MaxValue))
    assert(GrpcWire.parseGrpcTimeoutNanos("999999999S").isEmpty, "9 digits")
    assert(GrpcWire.parseGrpcTimeoutNanos("5x").isEmpty)
    assert(GrpcWire.parseGrpcTimeoutNanos("S").isEmpty)
  }
}
