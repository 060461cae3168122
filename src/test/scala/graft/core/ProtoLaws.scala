package graft.core

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Property checks of the hand-rolled protobuf wire codec: random messages
  * over a descriptor exercising every field kind must round-trip exactly,
  * encoding must be deterministic, and a reader with a narrower schema
  * must skip unknown fields without corruption (reader/writer skew — the
  * protobuf compatibility contract).
  */
object ProtoLaws extends Properties("ProtoWire") {

  private[core] val desc = "{1:i32=int32;2:i64=int64;3:s32=sint32;4:s64=sint64;" +
    "5:f32=fixed32;6:f64=sfixed64;7:b=bool;8:f=float;9:d=double;" +
    "10:s=string;11:by=bytes;12:tags=repeated string;13:nums=repeated sint64;" +
    "14:nested={1:q=int64;2:t=string}}"
  private val ser = new ProtoValueSerializer(desc)
  private val narrowSer = new ProtoValueSerializer("{10:s=string;2:i64=int64}")

  private val genString = Gen.listOf(Gen.oneOf(
    Gen.alphaNumChar, Gen.oneOf(' ', 'č', 'ž', '€', '\n'))).map(_.mkString)
  private val genBytes = Gen.listOf(Gen.choose(Byte.MinValue, Byte.MaxValue))
    .map(_.toArray)

  private[core] val genValue: Gen[Map[String, Any]] = for {
    i32 <- Gen.choose(Int.MinValue, Int.MaxValue)
    i64 <- Gen.choose(Long.MinValue, Long.MaxValue)
    s32 <- Gen.choose(Int.MinValue, Int.MaxValue)
    s64 <- Gen.choose(Long.MinValue, Long.MaxValue)
    f32 <- Gen.choose(0L, 4294967295L)
    f64 <- Gen.choose(Long.MinValue, Long.MaxValue)
    b <- Gen.oneOf(true, false)
    f <- Gen.oneOf(Gen.choose(-1e30f, 1e30f), Gen.oneOf(0.0f, -0.0f,
      Float.MaxValue, Float.NegativeInfinity))
    d <- Gen.oneOf(Gen.choose(-1e300, 1e300), Gen.oneOf(0.0, -0.0, math.Pi))
    s <- genString
    by <- genBytes
    tags <- Gen.listOf(genString)
    nums <- Gen.listOf(Gen.choose(Long.MinValue, Long.MaxValue))
    q <- Gen.choose(Long.MinValue, Long.MaxValue)
    t <- genString
  } yield Map(
    "i32" -> i32, "i64" -> i64, "s32" -> s32, "s64" -> s64,
    "f32" -> f32, "f64" -> f64, "b" -> b, "f" -> f, "d" -> d,
    "s" -> s, "by" -> by, "tags" -> tags.toSeq, "nums" -> nums.toSeq,
    "nested" -> Map("q" -> q, "t" -> t))

  private[core] def normalize(m: Map[String, Any]): Map[String, Any] = m.map {
    case (k, b: Array[Byte]) => k -> b.toSeq
    case (k, s: Seq[_]) => k -> s.map {
      case mm: Map[_, _] => normalize(mm.asInstanceOf[Map[String, Any]])
      case x => x
    }
    case (k, mm: Map[_, _]) => k -> normalize(mm.asInstanceOf[Map[String, Any]])
    // bit-pattern comparison, EXCEPT -0.0 ≡ 0.0: proto3 omits fields
    // numerically equal to the default, so -0.0 canonicalizes to +0.0 on
    // the wire (protobuf-java behaves identically)
    case (k, f: Float) =>
      k -> java.lang.Float.floatToIntBits(if (f == 0.0f) 0.0f else f)
    case (k, d: Double) =>
      k -> java.lang.Double.doubleToLongBits(if (d == 0.0) 0.0 else d)
    case kv => kv
  }

  /** The round-trip target: absent fields materialize as proto3 defaults
    * on decode (recursively for nested messages).
    */
  private[core] def filled(m: ProtoSchema.PMessage,
      v: Map[String, Any]): Map[String, Any] =
    m.fields.map { f =>
      val a = v.getOrElse(f.name, ProtoSchema.defaultOf(f.tpe))
      f.name -> (f.tpe match {
        case mm: ProtoSchema.PMessage =>
          filled(mm, a.asInstanceOf[Map[String, Any]])
        case _ => a
      })
    }.toMap

  private[core] val parsedDesc = ProtoSchema.parse(desc)

  property("roundTrip") = forAll(genValue) { v =>
    normalize(ser.deserialize(ser.serialize(v)).get) ==
      normalize(filled(parsedDesc, v))
  }

  property("deterministicEncoding") = forAll(genValue) { v =>
    ser.serialize(v).toSeq == ser.serialize(v).toSeq
  }

  property("doubleDecodeIdempotent") = forAll(genValue) { v =>
    val once = ser.deserialize(ser.serialize(v)).get
    val twice = ser.deserialize(ser.serialize(once)).get
    normalize(once) == normalize(twice)
  }

  property("readerSchemaSkew") = forAll(genValue) { v =>
    val narrow = narrowSer.deserialize(ser.serialize(v)).get
    narrow("s") == v("s") && narrow("i64") == v("i64")
  }
}
