package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** G.711 companded audio laws — REAL compressed (2:1) telephony audio
  * whose quantization is exact integer arithmetic, verified exhaustively:
  * every 16-bit PCM value round-trips to the closed-form quantizer, every
  * byte is a fixed point of encode∘decode, and the standard's anchor
  * values hold (μ-law 0xFF = silence, min -32124; A-law 0xD5 = +8).
  */
class G711Spec extends AnyFunSuite {

  // closed-form μ-law quantizer — the law the oracle SQL replays
  private def muQuant(pcm: Int): Int = {
    val sign = pcm < 0
    val m = math.min(if (sign) -pcm else pcm, 32635)
    val v = m + 132
    var e = 0
    while (v >= (256 << e)) e += 1 // v in [132, 32767] -> e in 0..7
    val mant = (v >> (e + 3)) & 0xF
    val mag = (((mant << 3) + 132) << e) - 132
    if (sign) -mag else mag
  }

  // closed-form A-law quantizer (Sun variant, as implemented)
  private def aQuant(pcm: Int): Int = {
    val pos = pcm >= 0
    var m = if (pos) pcm else -pcm - 8
    if (m < 0) m = 0
    if (m > 32635) m = 32635
    val (seg, aval) =
      if (m < 256) (0, m >> 4)
      else {
        var s = 7
        while ((m & (0x100 << (s - 1))) == 0) s -= 1
        (s, (s << 4) | ((m >> (s + 3)) & 0xF))
      }
    val mant = aval & 0xF
    val mag =
      if (seg == 0) (mant << 4) + 8
      else if (seg == 1) (mant << 4) + 0x108
      else ((mant << 4) + 0x108) << (seg - 1)
    if (pos) mag else -mag
  }

  test("mu-law: exhaustive 16-bit round trip equals the closed-form quantizer") {
    var pcm = -32768
    while (pcm <= 32767) {
      val got = MediaCodecs.muLawDecodeTable(MediaCodecs.muLawEncode(pcm))
      assert(got == muQuant(pcm), s"pcm=$pcm byte=${MediaCodecs.muLawEncode(pcm)}")
      pcm += 1
    }
  }

  test("a-law: exhaustive 16-bit round trip equals the closed-form quantizer") {
    var pcm = -32768
    while (pcm <= 32767) {
      val got = MediaCodecs.aLawDecodeTable(MediaCodecs.aLawEncode(pcm))
      assert(got == aQuant(pcm), s"pcm=$pcm byte=${MediaCodecs.aLawEncode(pcm)}")
      pcm += 1
    }
  }

  test("every byte is a fixed point of encode(decode(byte)) — except " +
      "mu-law's negative zero, which canonicalizes to 0xFF") {
    for (b <- 0 until 256) {
      // the standard's known ±0 pair: 0x7F and 0xFF both decode to 0;
      // encode maps 0 to the positive representation 0xFF
      val muWant = if (b == 0x7F) 0xFF else b
      assert(MediaCodecs.muLawEncode(MediaCodecs.muLawDecodeTable(b)) == muWant,
        s"mu byte $b")
      assert(MediaCodecs.aLawEncode(MediaCodecs.aLawDecodeTable(b)) == b,
        s"a byte $b")
    }
  }

  test("standard anchors: mu 0xFF = 0 (silence), 0x00 = -32124; a 0xD5 = +8, 0x55 = -8") {
    assert(MediaCodecs.muLawDecodeTable(0xFF) == 0)
    assert(MediaCodecs.muLawDecodeTable(0x00) == -32124)
    assert(MediaCodecs.muLawDecodeTable(0x80) == 32124)
    assert(MediaCodecs.aLawDecodeTable(0xD5) == 8)
    assert(MediaCodecs.aLawDecodeTable(0x55) == -8)
  }

  test("companded WAV container round-trips through decodeWav at half the bytes") {
    val pcm = Array.tabulate(480)(i => ((i * 2654435761L + 31) % 65536 - 32768).toShort)
    for (aLaw <- Seq(false, true)) {
      val wav = MediaCodecs.encodeWavG711(2, 8000, pcm, aLaw)
      assert(MediaCodecs.sniff(wav) == "wav")
      val dec = MediaCodecs.decodeWav(wav)
      assert(dec.channels == 2 && dec.sampleRate == 8000)
      val table = if (aLaw) MediaCodecs.aLawDecodeTable else MediaCodecs.muLawDecodeTable
      val enc: Int => Int = if (aLaw) MediaCodecs.aLawEncode else MediaCodecs.muLawEncode
      assert(dec.samples.toSeq == pcm.toSeq.map(p => table(enc(p.toInt))),
        s"aLaw=$aLaw")
      // 2:1: 8-bit payload vs the 16-bit PCM container
      val pcm16 = MediaCodecs.encodeWav(2, 8000, pcm)
      assert(wav.length - 44 == (pcm16.length - 44) / 2)
    }
  }

  test("decodeWav refuses G.711 with wrong bits and unknown formats loudly") {
    val wav = MediaCodecs.encodeWavG711(1, 8000, Array[Short](1, 2, 3, 4), aLaw = false)
    // flip bits/sample to 16: must refuse
    val bad = wav.clone(); bad(34) = 16
    intercept[IllegalArgumentException](MediaCodecs.decodeWav(bad))
    // unknown format tag
    val unk = wav.clone(); unk(20) = 2
    intercept[IllegalArgumentException](MediaCodecs.decodeWav(unk))
  }
}
