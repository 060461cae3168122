package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** The PNG codec (MediaCodecs.encodePng/decodePng) — a genuinely
  * COMPRESSED still-image format decoded pure-JDK (zlib Inflater, CRC32):
  * round trips under every row filter, validates chunk CRCs, refuses
  * unsupported shapes loudly, and plugs into the image pipeline so a PNG
  * and a BMP of the same pixels hash identically.
  */
class PngCodecSpec extends AnyFunSuite {

  private def px(x: Int, y: Int): Int =
    (((x * 7 + y * 13) % 256) << 16) | (((x * 3 + y * 29) % 256) << 8) |
      ((x * 11 + y * 5) % 256)

  test("round-trip is pixel-exact under all five row filters") {
    // widths cover every mod-4 class; each filter type exercises its own
    // defilter arithmetic (Sub/Up/Average/Paeth reference the left/up/
    // up-left neighbors)
    for (f <- 0 to 4; w <- Seq(1, 2, 7, 8); h <- Seq(1, 3, 8)) {
      val bytes = MediaCodecs.encodePng(w, h, px, filterType = f)
      val img = MediaCodecs.decodePng(bytes)
      assert(img.width == w && img.height == h)
      for (y <- 0 until h; x <- 0 until w)
        assert(img.pixels(y * w + x) == px(x, y), s"f=$f w=$w h=$h ($x,$y)")
    }
  }

  test("all-filter encodings of the same image decode identically") {
    val ref = MediaCodecs.decodePng(MediaCodecs.encodePng(13, 9, px, 0))
    for (f <- 1 to 4) {
      val alt = MediaCodecs.decodePng(MediaCodecs.encodePng(13, 9, px, f))
      assert(alt.pixels.toSeq == ref.pixels.toSeq, s"filter $f diverged")
    }
  }

  test("decoder validates CRCs and refuses unsupported shapes loudly") {
    val ok = MediaCodecs.encodePng(6, 4, px, 4)
    // flip one IDAT byte: the chunk CRC must catch it
    val corrupt = ok.clone()
    corrupt(ok.length - 20) = (corrupt(ok.length - 20) ^ 0x40).toByte
    val e1 = intercept[IllegalArgumentException](MediaCodecs.decodePng(corrupt))
    assert(e1.getMessage.contains("CRC") || e1.getMessage.contains("zlib"),
      e1.getMessage)
    // truncated payload
    intercept[IllegalArgumentException](
      MediaCodecs.decodePng(ok.take(ok.length - 10)))
    // not a PNG at all
    intercept[IllegalArgumentException](
      MediaCodecs.decodePng("plainly not a png".getBytes("UTF-8")))
    // interlaced: patch the IHDR interlace byte AND its CRC to isolate
    // the unsupported-shape refusal from the CRC check
    val inter = ok.clone()
    inter(8 + 8 + 12) = 1 // IHDR data byte 12 (interlace)
    val crc = new java.util.zip.CRC32()
    crc.update(inter, 8 + 4, 4 + 13) // type + data
    val cv = crc.getValue.toInt
    val cb = java.nio.ByteBuffer.allocate(4).putInt(cv).array()
    System.arraycopy(cb, 0, inter, 8 + 8 + 13, 4)
    val e2 = intercept[IllegalArgumentException](MediaCodecs.decodePng(inter))
    assert(e2.getMessage.contains("interlace"), e2.getMessage)
  }

  test("sniff recognizes the signature; decodeImage routes both formats") {
    val p = MediaCodecs.encodePng(5, 5, px)
    val b = MediaCodecs.encodeBmp(5, 5, px)
    assert(MediaCodecs.sniff(p) == "png")
    assert(MediaCodecs.decodeImage(p).get.pixels.toSeq ==
      MediaCodecs.decodeImage(b).get.pixels.toSeq,
      "the same pixels through PNG and BMP must decode identically")
  }

  test("multi-IDAT streams decode (chunk boundaries are arbitrary)") {
    // re-chunk a valid PNG's single IDAT into two
    val one = MediaCodecs.encodePng(9, 6, px, 2)
    val bb = java.nio.ByteBuffer.wrap(one).order(java.nio.ByteOrder.BIG_ENDIAN)
    bb.position(8)
    val out = new java.io.ByteArrayOutputStream()
    out.write(one, 0, 8)
    def chunk(typ: String, data: Array[Byte]): Unit = {
      val hdr = java.nio.ByteBuffer.allocate(8).putInt(data.length)
        .put(typ.getBytes("US-ASCII")).array()
      out.write(hdr)
      out.write(data)
      val crc = new java.util.zip.CRC32()
      crc.update(typ.getBytes("US-ASCII")); crc.update(data)
      out.write(java.nio.ByteBuffer.allocate(4).putInt(crc.getValue.toInt).array())
    }
    while (bb.remaining() >= 12) {
      val len = bb.getInt
      val tb = new Array[Byte](4); bb.get(tb)
      val typ = new String(tb, "US-ASCII")
      val data = new Array[Byte](len); bb.get(data); bb.getInt
      if (typ == "IDAT" && len >= 2) {
        val (a, b) = data.splitAt(len / 2)
        chunk("IDAT", a); chunk("IDAT", b)
      } else chunk(typ, data)
    }
    val img = MediaCodecs.decodePng(out.toByteArray)
    assert(img.pixels.toSeq ==
      MediaCodecs.decodePng(one).pixels.toSeq)
  }

  test("RGBA (color type 6) decodes with alpha dropped") {
    // hand-build a 2x2 RGBA PNG: filter 0 rows, known channel bytes
    val raw = Array[Byte](
      0, 10, 20, 30, -1, 40, 50, 60, 0, // y=0: (10,20,30,255) (40,50,60,0)
      0, 70, 80, 90, 127, 1, 2, 3, 64)  // y=1
    val deflater = new java.util.zip.Deflater()
    deflater.setInput(raw); deflater.finish()
    val z = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](256)
    while (!deflater.finished()) z.write(buf, 0, deflater.deflate(buf))
    val ihdr = java.nio.ByteBuffer.allocate(13)
      .putInt(2).putInt(2).put(8.toByte).put(6.toByte)
      .put(0.toByte).put(0.toByte).put(0.toByte).array()
    val out = new java.io.ByteArrayOutputStream()
    out.write(Array[Byte](0x89.toByte, 'P', 'N', 'G', '\r', '\n', 0x1a, '\n'))
    def chunk(typ: String, data: Array[Byte]): Unit = {
      out.write(java.nio.ByteBuffer.allocate(4).putInt(data.length).array())
      out.write(typ.getBytes("US-ASCII")); out.write(data)
      val crc = new java.util.zip.CRC32()
      crc.update(typ.getBytes("US-ASCII")); crc.update(data)
      out.write(java.nio.ByteBuffer.allocate(4).putInt(crc.getValue.toInt).array())
    }
    chunk("IHDR", ihdr); chunk("IDAT", z.toByteArray)
    chunk("IEND", Array.emptyByteArray)
    val img = MediaCodecs.decodePng(out.toByteArray)
    assert(img.width == 2 && img.height == 2)
    assert(img.pixels.toSeq == Seq(
      (10 << 16) | (20 << 8) | 30, (40 << 16) | (50 << 8) | 60,
      (70 << 16) | (80 << 8) | 90, (1 << 16) | (2 << 8) | 3))
  }

  test("hostile IHDR dims are refused before any allocation") {
    // re-patch a valid PNG's IHDR dims (and fix the chunk CRC so the
    // refusal under test is the bounds check, not the CRC check)
    def withDims(w: Int, h: Int): Array[Byte] = {
      val bytes = MediaCodecs.encodePng(4, 4, px, 0).clone()
      val ihdrData = 8 + 8 // sig + len/type
      val bb = java.nio.ByteBuffer.wrap(bytes, ihdrData, 8)
      bb.putInt(w).putInt(h)
      val crc = new java.util.zip.CRC32()
      crc.update(bytes, 8 + 4, 4 + 13)
      val cb = java.nio.ByteBuffer.allocate(4).putInt(crc.getValue.toInt).array()
      System.arraycopy(cb, 0, bytes, ihdrData + 13, 4)
      bytes
    }
    // width ~2^29: stride/rawLen would overflow Int to a negative array
    // size without the Long-math guard
    val e1 = intercept[IllegalArgumentException](
      MediaCodecs.decodePng(withDims(1 << 29, 1 << 20)))
    assert(e1.getMessage.contains("pixel cap"), e1.getMessage)
    // 20000x20000 from a tiny payload: would allocate ~1.2GB pre-guard
    val e2 = intercept[IllegalArgumentException](
      MediaCodecs.decodePng(withDims(20000, 20000)))
    assert(e2.getMessage.contains("pixel cap"), e2.getMessage)
    // dims under the pixel cap but unproducible from the small IDAT:
    // 5000x5000 -> 75MB raw, far beyond deflate's ~1032:1 max expansion
    val e3 = intercept[IllegalArgumentException](
      MediaCodecs.decodePng(withDims(5000, 5000)))
    assert(e3.getMessage.contains("not producible"), e3.getMessage)
  }
}
