package graft.streaming

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.scalacheck.{Arbitrary, Gen, Properties}
import org.scalacheck.Prop.forAll

import graft.core.StreamElement

/** Property laws for the [[KafkaWire]] protocol — the CodecFuzzLaws
  * discipline applied to the broker wire: every element round-trips the
  * frame codec bit-exactly (values are payload BYTES — one corrupted
  * byte is corrupted data), and a hostile peer gets a closed connection
  * + loud client failure, never a silent partial answer.
  */
object KafkaWireLaws extends Properties("KafkaWire") {

  private val genElement: Gen[StreamElement] = for {
    entity <- Gen.alphaNumStr.map(_.take(16))
    key <- Gen.asciiPrintableStr.map(_.take(64))
    attr <- Gen.oneOf(Gen.const("status"), Gen.alphaNumStr.map("a." + _.take(32)))
    uuid <- Gen.uuid.map(_.toString)
    seqId <- Arbitrary.arbitrary[Long]
    stamp <- Arbitrary.arbitrary[Long]
    value <- Gen.oneOf(
      Gen.const(null: Array[Byte]),
      Gen.const(Array.empty[Byte]),
      Gen.containerOf[Array, Byte](Arbitrary.arbitrary[Byte]))
    del <- Arbitrary.arbitrary[Boolean]
    delW <- Arbitrary.arbitrary[Boolean]
  } yield StreamElement(entity, key, attr, uuid, seqId, stamp, value,
    del, delW)

  property("element frame codec round-trips bit-exactly (null and empty " +
      "values distinguished)") = forAll(genElement) { e =>
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    KafkaWire.writeElement(out, e)
    out.flush()
    val back = KafkaWire.readElement(
      new DataInputStream(new ByteArrayInputStream(bos.toByteArray)))
    back.entity == e.entity && back.key == e.key &&
      back.attribute == e.attribute && back.uuid == e.uuid &&
      back.seqId == e.seqId && back.stamp == e.stamp &&
      back.delete == e.delete && back.deleteWildcard == e.deleteWildcard &&
      ((back.value == null && e.value == null) ||
        (back.value != null && e.value != null &&
          java.util.Arrays.equals(back.value, e.value)))
  }

  property("offset-map frame codec round-trips") =
    forAll(Gen.mapOf(Gen.zip(Gen.choose(0, 1 << 20),
        Arbitrary.arbitrary[Long]))) { m =>
      val bos = new ByteArrayOutputStream()
      val out = new DataOutputStream(bos)
      KafkaWire.writeOffsets(out, m)
      out.flush()
      KafkaWire.readOffsets(new DataInputStream(
        new ByteArrayInputStream(bos.toByteArray))) == m
    }

  property("a batch of elements survives the server end-to-end (socket " +
      "round trip preserves order, bytes, and offsets)") =
    forAll(Gen.nonEmptyListOf(genElement).map(_.take(20))) { elems =>
      val server = new KafkaWire.Server(0).start()
      try {
        val c = new KafkaWire.Client("127.0.0.1", server.port)
        try {
          val name = "fuzz-" + java.util.UUID.randomUUID().toString
          // 1-partition topic => the slice order IS the append order
          c.create(name, 1)
          c.appendBatch(name, elems.iterator)
          val back = c.slice(name, 0, 0L, Long.MaxValue)
          c.drop(name)
          back.length == elems.size &&
            back.zip(elems).forall { case (b, e) =>
              b.uuid == e.uuid && b.stamp == e.stamp &&
                ((b.value == null && e.value == null) ||
                  (b.value != null && e.value != null &&
                    java.util.Arrays.equals(b.value, e.value)))
            }
        } finally c.close()
      } finally server.close()
    }

  property("hostile request bytes never yield a silent wrong answer: " +
      "the connection dies and the client throws") =
    forAll(Gen.nonEmptyContainerOf[Array, Byte](Arbitrary.arbitrary[Byte])) {
      garbage =>
        val server = new KafkaWire.Server(0).start()
        try {
          val sock = new java.net.Socket("127.0.0.1", server.port)
          try {
            sock.getOutputStream.write(garbage)
            sock.getOutputStream.flush()
            // half-close: the server must terminate on EOF mid-frame,
            // not block forever waiting for the rest of a garbage frame
            sock.shutdownOutput()
            // drain whatever the server managed to parse before dying;
            // the stream must END (closed), not hang or loop
            sock.setSoTimeout(10000)
            val in = sock.getInputStream
            val buf = new Array[Byte](4096)
            var n = 0
            while (n >= 0) n = in.read(buf)
            true
          } finally sock.close()
        } finally server.close()
    }
}
