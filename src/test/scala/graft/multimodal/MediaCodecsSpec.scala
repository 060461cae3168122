package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.multimodal.MediaCodecs._

/** Laws for the real uncompressed-container codecs: byte-exact
  * round-trips (including the BMP row-padding widths), loud rejection of
  * corrupt payloads, the nearest-neighbor sampling law, and the sniffing
  * dispatch the Spark stages rely on.
  */
class MediaCodecsSpec extends AnyFunSuite {

  private def pix(x: Int, y: Int): Int =
    (((x * 7 + y * 13) % 256) << 16) | (((x * 11 + y * 3) % 256) << 8) |
      ((x + y) % 256)

  test("bmp round-trip is pixel-exact for every padding class of width") {
    for (w <- Seq(1, 2, 3, 4, 5, 8, 13); h <- Seq(1, 3, 7)) {
      val bytes = encodeBmp(w, h, pix)
      // stride is 4-byte aligned: file size pins the padding arithmetic
      assert(bytes.length == 54 + ((w * 3 + 3) / 4 * 4) * h, s"$w x $h")
      val got = decodeBmp(bytes)
      assert(got.width == w && got.height == h, s"$w x $h")
      for (y <- 0 until h; x <- 0 until w)
        assert(got(x, y) == pix(x, y), s"($x, $y) of $w x $h")
    }
  }

  test("bmp decoder rejects corrupt payloads loudly") {
    val ok = encodeBmp(5, 4, pix)
    def err(b: Array[Byte]): String =
      intercept[IllegalArgumentException](decodeBmp(b)).getMessage
    assert(err(ok.take(10)).contains("bytes"))
    assert(err("XX".getBytes ++ ok.drop(2)).contains("magic"))
    assert(err(ok.dropRight(3)).contains("outside")) // truncated pixel data
    val badBpp = ok.clone(); badBpp(28) = 8 // bpp field
    assert(err(badBpp).contains("bpp"))
  }

  test("bmp refuses hostile header dims before allocating (width*3 wraps Int)") {
    // width 0x40000006 makes the Int rowStride negative, which slipped the
    // dataOffset+stride*height bounds check and then attempted a multi-GB
    // pixel allocation (OutOfMemoryError / NegativeArraySizeException)
    val ok = encodeBmp(5, 4, pix)
    val hostile = ok.clone()
    val b = java.nio.ByteBuffer.wrap(hostile).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.putInt(18, 0x40000006) // biWidth
    val e = intercept[IllegalArgumentException](decodeBmp(hostile))
    assert(e.getMessage.contains("pixel cap"))
    for (h <- Seq(1, 2, 7)) { // other heights hit the NegativeArraySize path
      b.putInt(22, h)
      assert(intercept[IllegalArgumentException](decodeBmp(hostile))
        .getMessage.contains("pixel cap"), s"height $h")
    }
  }

  test("wav round-trip preserves samples, channels, rate, duration math") {
    for (ch <- Seq(1, 2); frames <- Seq(1, 64, 101)) {
      val samples = Array.tabulate(frames * ch)(i => (i * 317 - 9000).toShort)
      val w = decodeWav(encodeWav(ch, 8000, samples))
      assert(w.channels == ch && w.sampleRate == 8000)
      assert(w.samples.toSeq == samples.toSeq)
      assert(w.nFrames == frames && w.durationMs == frames * 1000L / 8000)
    }
  }

  test("wav decoder walks auxiliary chunks and rejects corrupt payloads") {
    val base = encodeWav(2, 8000, Array.tabulate(8)(_.toShort))
    // splice a LIST chunk (odd size — exercises word-alignment skip)
    // between WAVE and fmt; the decoder must walk over it
    val list = "LIST".getBytes("US-ASCII") ++ Array[Byte](3, 0, 0, 0, 1, 2, 3, 0)
    val spliced = base.take(12) ++ list ++ base.drop(12)
    val w = decodeWav(spliced)
    assert(w.channels == 2 && w.samples.length == 8)
    def err(b: Array[Byte]): String =
      intercept[IllegalArgumentException](decodeWav(b)).getMessage
    assert(err(base.take(8)).contains("RIFF"))
    assert(err(base.dropRight(4)).contains("overruns"))
    val badFmt = base.clone(); badFmt(20) = 2 // ADPCM: genuinely unsupported
    assert(err(badFmt).contains("format"))
    // fmt 7 (mu-law) is now a REAL codec — a PCM16 payload relabeled 7
    // must refuse on the bits/sample contract, not decode garbage
    val muBits = base.clone(); muBits(20) = 7
    assert(err(muBits).contains("bits/sample"))
  }

  test("y4m refuses hostile header dims before allocating (3*w*h wraps Int)") {
    // 46341^2 > 2^31/3: a wrapped-positive frame size would silently
    // accept a frame with the wrong byte count; the cap refuses first
    val hostile = ("YUV4MPEG2 W46341 H46341 F25:1 C444\nFRAME\n" + "x" * 64)
      .getBytes("US-ASCII")
    val e = intercept[IllegalArgumentException](decodeY4m(hostile))
    assert(e.getMessage.contains("pixel cap"), e.getMessage)
  }

  test("y4m round-trip preserves dims, fps, every plane byte") {
    def plane(f: Int, p: Int, i: Int): Int = (f * 11 + p * 97 + i * 7) % 256
    for (nf <- Seq(0, 1, 5)) {
      val v = decodeY4m(encodeY4m(5, 3, 25, 1, nf, plane))
      assert(v.width == 5 && v.height == 3 && v.fpsNum == 25 && v.fpsDen == 1)
      assert(v.nFrames == nf && v.durationMs == nf * 40L)
      for (f <- 0 until nf; p <- 0 until 3; i <- 0 until 15)
        assert((v.frames(f)(p * 15 + i) & 0xff) == plane(f, p, i),
          s"frame $f plane $p pixel $i")
    }
  }

  test("y4m decoder tolerates FRAME params, rejects corrupt payloads") {
    val base = encodeY4m(4, 4, 30, 1, 2, (f, p, i) => (f + p + i) % 256)
    // splice params onto the first FRAME marker — spec-legal, must skip
    val hdrEnd = base.indexOf('\n'.toByte) + 1
    val withParams = base.take(hdrEnd) ++ "FRAME Xinterlace\n".getBytes ++
      base.drop(hdrEnd + 6)
    val v = decodeY4m(withParams)
    assert(v.nFrames == 2 && v.fpsNum == 30)
    def err(b: Array[Byte]): String =
      intercept[IllegalArgumentException](decodeY4m(b)).getMessage
    assert(err("JUNKHEADER\n".getBytes).contains("magic"))
    assert(err(base.dropRight(5)).contains("overruns"))
    assert(err("YUV4MPEG2 W4 H4 F25:1 C420\nFRAME\n".getBytes)
      .contains("C420"))
    assert(err("YUV4MPEG2 W4 F25:1 C444\nFRAME\n".getBytes).contains("dims"))
  }

  test("nearest-neighbor resize samples src(x*sw div ow, y*sh div oh)") {
    val src = decodeBmp(encodeBmp(9, 7, pix))
    val out = resizeBmpNearest(src, 4, 3)
    for (y <- 0 until 3; x <- 0 until 4)
      assert(out(x, y) == src(x * 9 / 4, y * 7 / 3), s"($x, $y)")
  }

  test("sniff routes by magic; SniffCodec decodes real containers") {
    val bmp = encodeBmp(6, 5, pix)
    val wav = encodeWav(2, 8000, Array.tabulate(32)(_.toShort))
    val y4m = encodeY4m(4, 4, 25, 1, 2, (_, _, _) => 7)
    assert(sniff(bmp) == "bmp" && sniff(wav) == "wav" && sniff(y4m) == "y4m")
    assert(sniff("plain text".getBytes) == "unknown")
    assert(Multimodal.SniffCodec.decodeMeta("video", y4m) == ((4, 4, 80L, 3)))
    assert(Multimodal.SniffCodec.decodeMeta("image", bmp) == ((6, 5, 0L, 3)))
    assert(Multimodal.SniffCodec.decodeMeta("audio", wav) == ((0, 0, 2L, 2)))
    // unknown falls through to the documented stub
    val p = "zz".getBytes
    assert(Multimodal.SniffCodec.decodeMeta("image", p) ==
      Multimodal.StubCodec.decodeMeta("image", p))
  }

  test("synthetic media pipeline: real decode matches the closed forms") {
    val spark = SparkSpec.spark
    val media = Multimodal.syntheticMedia(spark, "/root/testdata/sf0.001")
    val img = Multimodal.imageStats(media).collect()
      .map(s => s.mediaId -> s).toMap
    assert(img.nonEmpty)
    img.values.foreach { s =>
      val id = s.mediaId
      assert(id % 3 == 0 && s.width == (8 + (id * 5) % 9).toInt &&
        s.height == (8 + (id * 3) % 9).toInt, s.toString)
      // closed-form check of one channel sum
      var r = 0L
      for (y <- 0 until s.height; x <- 0 until s.width)
        r += (x * 7 + y * 13 + id) % 256
      assert(s.sumR == r, s.toString)
    }
    val aud = Multimodal.audioStats(media).collect()
    assert(aud.nonEmpty)
    aud.foreach { a =>
      val id = a.mediaId
      val ch = (1 + id % 2).toInt
      val frames = (64 + id % 64).toInt
      assert(id % 3 == 1 && a.channels == ch &&
        a.nSamples == frames.toLong * ch, a.toString)
    }
    // real frame sampling over the Y4M tier: closed-form plane sums
    val frames = Multimodal.videoFrameStats(media, stride = 2).collect()
    assert(frames.nonEmpty)
    frames.foreach { fs =>
      val id = fs.mediaId
      val wh = (4 + id % 5).toInt * (4 + (id * 7) % 5).toInt
      assert(id % 3 == 2 && fs.frameIdx % 2 == 0, fs.toString)
      var y = 0L
      for (i <- 0 until wh) y += (i * 7 + fs.frameIdx * 11 + id) % 256
      assert(fs.sumY == y, fs.toString)
    }

    // real resize halves dims; re-decoded stats match NN sampling of src
    val resized = Multimodal.imageStats(
      Multimodal.resizeImages(media, 1, 2)).collect()
    resized.foreach { s =>
      val id = s.mediaId
      val sw = (8 + (id * 5) % 9).toInt
      val sh = (8 + (id * 3) % 9).toInt
      assert(s.width == sw / 2 && s.height == sh / 2, s.toString)
      var r = 0L
      for (y <- 0 until s.height; x <- 0 until s.width) {
        val sx = x * sw / s.width; val sy = y * sh / s.height
        r += (sx * 7 + sy * 13 + id) % 256
      }
      assert(s.sumR == r, s.toString)
    }
  }
}
