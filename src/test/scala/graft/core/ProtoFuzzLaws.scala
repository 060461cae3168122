package graft.core

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll

/** Wire-decoder robustness: at corpus scale the BINARY value column
  * carries whatever a foreign writer produced, and the hand-rolled proto
  * reader must parse or refuse with IllegalArgumentException — never
  * an index leak, and NEVER an allocation sized by a corrupt varint
  * (`copyOfRange` zero-pads past the payload, so an unchecked claimed
  * length of 2^30 would allocate a gigabyte from a 20-byte value).
  */
object ProtoFuzzLaws extends Properties("ProtoFuzz") {

  override def overrideParameters(p: org.scalacheck.Test.Parameters): org.scalacheck.Test.Parameters =
    p.withMinSuccessfulTests(sys.env.getOrElse("GRAFT_FUZZ_N", "500").toInt)

  private val ser = new ProtoValueSerializer(
    "{1:id=int64;2:name=string;3:scores=repeated double;4:tags=repeated string;5:meta={1:lang=string;2:rank=sint32}}")

  private lazy val valid: Array[Byte] = ser.serialize(Map(
    "id" -> 42L, "name" -> "alpha",
    "scores" -> Vector(1.5, -2.25, 0.0),
    "tags" -> Vector("a", "bb"),
    "meta" -> Map("lang" -> "en", "rank" -> -3)))

  private val garbage: Gen[Array[Byte]] =
    Gen.choose(0, 96).flatMap(n =>
      Gen.listOfN(n, Gen.choose(Byte.MinValue, Byte.MaxValue)).map(_.toArray))

  private val mutated: Gen[Array[Byte]] = for {
    i <- Gen.choose(0, valid.length - 1)
    b <- Gen.choose(Byte.MinValue, Byte.MaxValue)
  } yield { val c = valid.clone(); c(i) = b; c }

  private val truncated: Gen[Array[Byte]] =
    Gen.choose(0, valid.length - 1).map(valid.take)

  // length-claim hostility: a valid field tag followed by a huge varint
  private val hugeClaim: Gen[Array[Byte]] = Gen.oneOf(
    Seq(0x12, 0xFF, 0xFF, 0xFF, 0xFF, 0x07),      // field 2 wt 2, len ~2^32
    Seq(0x12, 0xF0, 0xFF, 0xFF, 0xFF, 0x07, 0x61), // huge len, 1 actual byte
    Seq(0x1A, 0xFE, 0xFF, 0xFF, 0xFF, 0x0F),      // packed field, len < 0 as Int
    Seq(0x3A, 0x80, 0x80, 0x80, 0x80, 0x10)       // unknown field skip, huge len
  ).map(_.map(_.toByte).toArray)

  private val hostile: Gen[Array[Byte]] =
    Gen.frequency(2 -> garbage, 3 -> mutated, 2 -> truncated, 1 -> hugeClaim)

  property("deserialize parses or refuses with IllegalArgumentException; " +
      "no index leaks, no claimed-length allocations") =
    forAll(hostile) { bytes =>
      val outcome =
        try { ser.deserialize(bytes); true }
        catch {
          case _: IllegalArgumentException => true
          case other: Throwable =>
            println(s"leaked ${other.getClass.getName}: ${other.getMessage} on " +
              bytes.take(24).map("%02x".format(_)).mkString)
            false
        }
      Prop(outcome)
    }

  property("round trip of the valid fixture survives the hardened reader") =
    Prop(ser.deserialize(valid).exists(m =>
      m("id") == 42L && m("name") == "alpha"))
}
