package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** JPEG/GIF support via the JDK's bundled ImageIO plugins: a gray GIF
  * (<= 256 colors) round-trips LOSSLESSLY, a JPEG decodes with exact
  * header dims and bounded lossy pixel error, sniff routes both magics,
  * and corrupt payloads refuse loudly.
  */
class ImageIoCodecSpec extends AnyFunSuite {

  private def gray(x: Int, y: Int): Int = (x * 7 + y * 13) % 256
  private def rgb(x: Int, y: Int): Int =
    (((x * 7 + y * 13) % 256) << 16) | (((x * 11 + y * 3) % 256) << 8) |
      ((x + y * 5) % 256)

  test("gray GIF round-trip is pixel-exact (palette holds <= 256 colors)") {
    val bytes = MediaCodecs.encodeGifGray(17, 13, gray)
    assert(MediaCodecs.sniff(bytes) == "gif")
    val img = MediaCodecs.decodeImageIo(bytes)
    assert(img.width == 17 && img.height == 13)
    for (y <- 0 until 13; x <- 0 until 17) {
      val g = gray(x, y)
      assert(img.pixels(y * 17 + x) == ((g << 16) | (g << 8) | g), s"($x,$y)")
    }
  }

  test("JPEG decodes with exact dims and bounded lossy error") {
    val bytes = MediaCodecs.encodeJpeg(24, 16, rgb)
    assert(MediaCodecs.sniff(bytes) == "jpeg")
    val img = MediaCodecs.decodeImageIo(bytes)
    assert(img.width == 24 && img.height == 16)
    // lossy, but a DCT round trip of a smooth-ish gradient stays within
    // a generous per-channel band (this is a real decode, not a fake)
    var worst = 0
    for (y <- 0 until 16; x <- 0 until 24) {
      val want = rgb(x, y); val got = img.pixels(y * 24 + x)
      for (sh <- Seq(16, 8, 0))
        worst = math.max(worst, math.abs(((want >> sh) & 0xff) - ((got >> sh) & 0xff)))
    }
    assert(worst <= 160, s"per-channel error $worst implausible for a real decode")
    assert(worst > 0, "a bit-exact JPEG round trip of this pattern is implausible")
  }

  test("decodeImage routes all four still-image containers") {
    val viaGif = MediaCodecs.decodeImage(MediaCodecs.encodeGifGray(5, 4, gray))
    val viaBmp = MediaCodecs.decodeImage(MediaCodecs.encodeBmp(5, 4,
      (x, y) => { val g = gray(x, y); (g << 16) | (g << 8) | g }))
    assert(viaGif.get.pixels.toSeq == viaBmp.get.pixels.toSeq)
    assert(MediaCodecs.decodeImage(MediaCodecs.encodeJpeg(5, 4, rgb)).isDefined)
    assert(MediaCodecs.decodeImage("not an image".getBytes("UTF-8")).isEmpty)
  }

  test("animated gray GIF: every frame round-trips exactly; frame sampling decodes the compressed stream") {
    val bytes = MediaCodecs.encodeGifAnim(6, 5, 4,
      (f, x, y) => (x * 7 + y * 13 + f * 31) % 256)
    val frames = MediaCodecs.decodeGifFrames(bytes)
    assert(frames.length == 4)
    for (f <- 0 until 4; y <- 0 until 5; x <- 0 until 6) {
      val g = (x * 7 + y * 13 + f * 31) % 256
      assert(frames(f).pixels(y * 6 + x) == ((g << 16) | (g << 8) | g),
        s"frame $f ($x,$y)")
    }
    // a single-frame gif decodes through the same path
    assert(MediaCodecs.decodeGifFrames(
      MediaCodecs.encodeGifGray(3, 3, (x, y) => x + y)).length == 1)
    intercept[IllegalArgumentException](
      MediaCodecs.decodeGifFrames("nope".getBytes("UTF-8")))
  }

  test("ImageIO stream cache stays memory-backed (no temp file per decode)") {
    // the default FileCacheImageInputStream creates+deletes a temp FILE
    // per decoded image — a pure tax on in-memory payloads and a measured
    // source of 2-4x order-dependent bench swings (BENCH_NOTES_r12)
    MediaCodecs.decodeImageIo(MediaCodecs.encodeJpeg(4, 4, rgb))
    assert(!javax.imageio.ImageIO.getUseCache,
      "decode path must run with ImageIO.setUseCache(false)")
  }

  test("corrupt JPEG/GIF payloads refuse loudly") {
    val j = MediaCodecs.encodeJpeg(8, 8, rgb)
    intercept[IllegalArgumentException](
      MediaCodecs.decodeImageIo(j.take(6))) // magic only, no frame
    val g = MediaCodecs.encodeGifGray(8, 8, gray)
    intercept[IllegalArgumentException](
      MediaCodecs.decodeImageIo(g.take(8)))
  }
}
