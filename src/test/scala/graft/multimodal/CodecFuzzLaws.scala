package graft.multimodal

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll

/** Parser-robustness law over EVERY codec: a 100 TB corpus feeds the
  * decoders arbitrary bytes, and each must either parse or refuse with
  * the intended IllegalArgumentException — never leak a
  * BufferUnderflow/IndexOutOfBounds/NegativeArraySize, never allocate
  * unboundedly, never hang. Three hostile input classes: random garbage,
  * truncations of valid payloads, and single-byte mutations of valid
  * payloads (the class that slips past magic-byte sniffing).
  */
object CodecFuzzLaws extends Properties("CodecFuzz") {

  override def overrideParameters(p: org.scalacheck.Test.Parameters): org.scalacheck.Test.Parameters =
    p.withMinSuccessfulTests(sys.env.getOrElse("GRAFT_FUZZ_N", "300").toInt)

  private def px(x: Int, y: Int): Int =
    (((x * 7 + y * 13) % 256) << 16) | (((x * 3 + y) % 256) << 8) | ((x + y) % 256)

  // one valid payload per container — mutation/truncation fuzz seeds
  private lazy val valids: Seq[Array[Byte]] = Seq(
    MediaCodecs.encodeBmp(6, 5, px),
    MediaCodecs.encodePng(6, 5, px, filterType = 3),
    MediaCodecs.encodeWav(2, 8000, Array.tabulate(12)(_.toShort)),
    MediaCodecs.encodeWavG711(1, 8000, Array.tabulate(10)(i => (i * 999).toShort), aLaw = true),
    MediaCodecs.encodeWavAdpcm(2, 8000, Array.tabulate(40)(i => (i * 1234 - 9000).toShort), 9),
    FlacCodec.encodeFlac(2, 8000, Array.tabulate(40)(i => (i * 777 - 11000).toShort), 17),
    MediaCodecs.encodeJpeg(6, 5, px),
    MediaCodecs.encodeGifGray(6, 5, (x, y) => (x * 7 + y) % 256),
    MediaCodecs.encodeGifAnim(5, 4, 3, (f, x, y) => (x + y + f * 31) % 256),
    MediaCodecs.encodeY4m(4, 3, 25, 1, 2, (f, p, i) => (f + p * 9 + i) % 256),
    MediaCodecs.encodeAviMjpeg(6, 5, 2, 33333, f => (x, y) => px(x + f, y)))

  private val garbage: Gen[Array[Byte]] =
    Gen.choose(0, 256).flatMap(n =>
      Gen.listOfN(n, Gen.choose(Byte.MinValue, Byte.MaxValue)).map(_.toArray))

  private val truncated: Gen[Array[Byte]] = for {
    v <- Gen.oneOf(valids)
    n <- Gen.choose(0, v.length - 1)
  } yield v.take(n)

  private val mutated: Gen[Array[Byte]] = for {
    v <- Gen.oneOf(valids)
    i <- Gen.choose(0, v.length - 1)
    b <- Gen.choose(Byte.MinValue, Byte.MaxValue)
  } yield { val c = v.clone(); c(i) = b; c }

  /** Structured hostility: a VALID RIFF magic over a random chunk soup —
    * the class plain mutation rarely reaches (it found the AVI
    * LIST-size<4 underflow that 300 mutation samples missed).
    */
  private val riffSoup: Gen[Array[Byte]] = for {
    form <- Gen.oneOf("AVI ", "WAVE")
    nChunks <- Gen.choose(0, 4)
    chunks <- Gen.listOfN(nChunks, for {
      id <- Gen.oneOf("LIST", "fmt ", "data", "avih", "00dc", "JUNK")
      // near-MaxValue sizes probe the Int-overflow class of bounds bugs
      declared <- Gen.frequency(8 -> Gen.choose(-8, 64),
        1 -> Gen.oneOf(Int.MaxValue, Int.MaxValue - 15, 1 << 30))
      actual <- Gen.choose(0, 16)
      body <- Gen.listOfN(actual, Gen.choose(Byte.MinValue, Byte.MaxValue))
    } yield {
      val b = java.nio.ByteBuffer.allocate(8 + actual)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      b.put(id.getBytes("US-ASCII")).putInt(declared).put(body.toArray)
      b.array()
    })
  } yield {
    val body = form.getBytes("US-ASCII") ++ chunks.flatten
    val out = java.nio.ByteBuffer.allocate(8 + body.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put("RIFF".getBytes("US-ASCII")).putInt(body.length).put(body)
    out.array()
  }

  /** FLAC-shaped hostility: a structurally VALID prefix (magic +
    * STREAMINFO + frame header with a CORRECT CRC-8) over hostile
    * subframe bytes — plain mutation almost never passes the header
    * CRC, so rice/partition parsing would otherwise go unfuzzed.
    */
  private val flacSoup: Gen[Array[Byte]] = for {
    nBody <- Gen.choose(0, 40)
    body <- Gen.listOfN(nBody, Gen.choose(Byte.MinValue, Byte.MaxValue))
    total <- Gen.oneOf(1L, 16L, 192L, 4096L, (1L << 36) - 1)
    bsRaw <- Gen.oneOf(0, 1, 15, 191, 4095, 65535)
    chCode <- Gen.oneOf(0, 1, 8, 9, 10, 15) // mono/stereo/decorrelated/reserved
  } yield {
    val b = java.nio.ByteBuffer.allocate(4 + 4 + 34 + 16 + nBody)
    b.put("fLaC".getBytes("US-ASCII"))
    b.put(0x80.toByte); b.put(0.toByte); b.put(0.toByte); b.put(34.toByte)
    b.putShort(192); b.putShort(192)          // block size bounds
    b.put(Array[Byte](0, 0, 0, 0, 0, 0))      // frame size bounds
    // rate 8000 (20 bits) + ch-1 (3) + bps-1 (5) + total (36), packed
    val rate = 8000L
    val ch = if (chCode >= 1 && chCode <= 10) 1L else 0L // stereo codes need 2ch
    val bps = 15L
    val packed = (rate << 44) | (ch << 41) | (bps << 36) | (total & ((1L << 36) - 1))
    b.putLong(packed)
    b.put(new Array[Byte](16))                // md5 (unchecked)
    // frame header: sync+codes, frame 0, explicit bs-1 + rate, CRC-8
    val hdr = java.nio.ByteBuffer.allocate(10)
    hdr.putShort(0xFFF8.toShort)              // 3FFE<<2 | rsv | fixed
    hdr.put(0x7D.toByte)                      // bs code 7, sr code 13
    hdr.put(((chCode << 4) | 0x08).toByte)    // channel code, bps 100, rsv
    hdr.put(0.toByte)                         // coded frame number 0
    hdr.putShort(bsRaw.toShort)               // blocksize - 1
    hdr.putShort(8000.toShort)                // sample rate
    val h = hdr.array()
    h(9) = 0 // placeholder replaced below
    val hdr9 = h.take(9)
    b.put(hdr9)
    b.put(FlacCodec.crc8(hdr9, 0, 9).toByte)
    b.put(body.toArray)
    b.array()
  }

  private val hostile: Gen[Array[Byte]] =
    Gen.frequency(1 -> garbage, 2 -> truncated, 2 -> mutated, 2 -> riffSoup,
      1 -> flacSoup)

  /** Every decoder, one entry point each. sniff-routing decoders get the
    * payload regardless of magic, like a mislabeled corpus column would.
    */
  private val decoders: Seq[(String, Array[Byte] => Any)] = Seq(
    "decodeBmp" -> MediaCodecs.decodeBmp _,
    "decodePng" -> MediaCodecs.decodePng _,
    "decodeWav" -> MediaCodecs.decodeWav _,
    "decodeImageIo" -> MediaCodecs.decodeImageIo _,
    "decodeGifFrames" -> MediaCodecs.decodeGifFrames _,
    "decodeY4m" -> MediaCodecs.decodeY4m _,
    "decodeAviMeta" -> MediaCodecs.decodeAviMeta _,
    "decodeFlac" -> FlacCodec.decodeFlac _,
    "decodeAviFrames" -> ((b: Array[Byte]) => MediaCodecs.decodeAviFrames(b, 1)),
    "decodeImage" -> MediaCodecs.decodeImage _,
    "sniff" -> MediaCodecs.sniff _)

  property("decoders parse or refuse with IllegalArgumentException — " +
      "no underflow/overflow/NPE leaks on garbage, truncation, mutation") =
    forAll(hostile) { bytes =>
      Prop.all(decoders.map { case (name, dec) =>
        val outcome =
          try { dec(bytes); true }
          catch {
            case _: IllegalArgumentException => true
            case other: Throwable =>
              println(s"$name leaked ${other.getClass.getName}: " +
                s"${other.getMessage} on ${bytes.length} bytes " +
                bytes.take(48).map("%02x".format(_)).mkString)
              false
          }
        Prop(outcome).label(name)
      }: _*)
    }
}
