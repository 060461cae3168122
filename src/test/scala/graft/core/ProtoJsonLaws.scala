package graft.core

import org.scalacheck.Properties
import org.scalacheck.Prop.forAll

/** Property checks of the proto-json codec over the same generator as the
  * wire-codec laws: random messages round-trip through canonical proto3
  * JSON, encoding is deterministic, and — the interchangeability
  * contract — decoding a value through the JSON codec agrees exactly with
  * decoding the same value through the binary wire codec.
  */
object ProtoJsonLaws extends Properties("ProtoJson") {

  import ProtoLaws.{desc, filled, genValue, normalize, parsedDesc}

  private val js = new ProtoJsonValueSerializer(desc)
  private val wire = new ProtoValueSerializer(desc)

  property("roundTrip") = forAll(genValue) { v =>
    normalize(js.deserialize(js.serialize(v)).get) ==
      normalize(filled(parsedDesc, v))
  }

  property("deterministicEncoding") = forAll(genValue) { v =>
    js.serialize(v).toSeq == js.serialize(v).toSeq
  }

  property("doubleDecodeIdempotent") = forAll(genValue) { v =>
    val once = js.deserialize(js.serialize(v)).get
    val twice = js.deserialize(js.serialize(once)).get
    normalize(once) == normalize(twice)
  }

  property("agreesWithWireCodec") = forAll(genValue) { v =>
    normalize(js.deserialize(js.serialize(v)).get) ==
      normalize(wire.deserialize(wire.serialize(v)).get)
  }
}
