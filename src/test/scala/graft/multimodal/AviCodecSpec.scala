package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** Motion-JPEG AVI: a REAL compressed-video container (RIFF hdrl/movi,
  * one '00dc' JPEG per frame) with container-exact header truth and
  * bounded-error frame pixels (JPEG is lossy — same discipline as
  * ImageIoCodecSpec's JPEG gate).
  */
class AviCodecSpec extends AnyFunSuite {

  private def px(f: Int)(x: Int, y: Int): Int = {
    val v = (x * 7 + y * 13 + f * 41) % 200 + 28
    (v << 16) | (v << 8) | v
  }

  test("header truth round-trips exactly: dims, timing, frame count") {
    val avi = MediaCodecs.encodeAviMjpeg(16, 12, 5, 33333, px)
    assert(MediaCodecs.sniff(avi) == "avi")
    val m = MediaCodecs.decodeAviMeta(avi)
    assert(m == MediaCodecs.AviMeta(16, 12, 33333, 5))
  }

  test("stride sampling decodes the right frames at the right dims") {
    val avi = MediaCodecs.encodeAviMjpeg(16, 12, 7, 40000, px)
    val frames = MediaCodecs.decodeAviFrames(avi, stride = 2)
    assert(frames.map(_._1).toSeq == Seq(0, 2, 4, 6))
    assert(frames.forall { case (_, b) => b.width == 16 && b.height == 12 })
    // stride 1 decodes every frame
    assert(MediaCodecs.decodeAviFrames(avi, 1).length == 7)
  }

  test("sampled frame pixels stay within a bounded lossy error of the source") {
    val avi = MediaCodecs.encodeAviMjpeg(16, 16, 3, 33333, px)
    val frames = MediaCodecs.decodeAviFrames(avi, 1)
    var worst = 0
    frames.foreach { case (f, b) =>
      for (y <- 0 until 16; x <- 0 until 16) {
        val want = px(f)(x, y) & 0xff
        val got = b(x, y) & 0xff
        worst = math.max(worst, math.abs(want - got))
      }
    }
    assert(worst <= 160, s"per-channel error $worst implausible for a real decode")
    assert(worst > 0, "a bit-exact MJPEG round trip of this pattern is implausible")
  }

  test("corrupt and truncated AVIs refuse loudly") {
    val avi = MediaCodecs.encodeAviMjpeg(8, 8, 2, 33333, px)
    intercept[IllegalArgumentException](
      MediaCodecs.decodeAviMeta("RIFFxxxxAVI ".getBytes("US-ASCII")))
    intercept[IllegalArgumentException](
      MediaCodecs.decodeAviFrames(avi.take(40), 1)) // header only, no movi
    intercept[IllegalArgumentException](
      MediaCodecs.decodeAviMeta(avi.take(11))) // not even the magic
    // a chunk size overrunning the payload must refuse, not overread
    val bad = avi.clone()
    val lb = java.nio.ByteBuffer.wrap(bad).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    lb.putInt(16, Int.MaxValue) // first LIST's size field
    intercept[IllegalArgumentException](MediaCodecs.decodeAviMeta(bad))
  }

  test("LIST too small for its list type refuses, never underflows " +
      "(CodecFuzzLaws regression)") {
    def le32(v: Int) = java.nio.ByteBuffer.allocate(4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).putInt(v).array()
    val body = "AVI ".getBytes("US-ASCII") ++
      "LIST".getBytes("US-ASCII") ++ le32(2) ++ Array[Byte](1, 2)
    val avi = "RIFF".getBytes("US-ASCII") ++ le32(body.length) ++ body
    val e1 = intercept[IllegalArgumentException](MediaCodecs.decodeAviMeta(avi))
    assert(e1.getMessage.contains("LIST size"), e1.getMessage)
    val e2 = intercept[IllegalArgumentException](MediaCodecs.decodeAviFrames(avi, 1))
    assert(e2.getMessage.contains("LIST size"), e2.getMessage)
    // an hdrl LIST too small for the avih it promises also refuses
    val tiny = "AVI ".getBytes("US-ASCII") ++
      "LIST".getBytes("US-ASCII") ++ le32(8) ++ "hdrl".getBytes("US-ASCII") ++
      Array[Byte](0, 0, 0, 0)
    val avi2 = "RIFF".getBytes("US-ASCII") ++ le32(tiny.length) ++ tiny
    val e3 = intercept[IllegalArgumentException](MediaCodecs.decodeAviMeta(avi2))
    assert(e3.getMessage.contains("cannot hold avih"), e3.getMessage)
    // a frame chunk size near Int.MaxValue must hit the overrun guard,
    // not wrap `position + size` negative and allocate unboundedly
    val huge = "AVI ".getBytes("US-ASCII") ++
      "LIST".getBytes("US-ASCII") ++ le32(4 + 8) ++
      "movi".getBytes("US-ASCII") ++
      "00dc".getBytes("US-ASCII") ++ le32(Int.MaxValue - 15)
    val avi3 = "RIFF".getBytes("US-ASCII") ++ le32(huge.length) ++ huge
    val e4 = intercept[IllegalArgumentException](MediaCodecs.decodeAviFrames(avi3, 1))
    assert(e4.getMessage.contains("overruns"), e4.getMessage)
  }

  test("odd-sized chunk ending at the payload's last byte keeps codec framing") {
    def le32(v: Int): Array[Byte] = java.nio.ByteBuffer.allocate(4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).putInt(v).array()
    // the word-align pad byte of a trailing odd chunk sits PAST the buffer;
    // the skip must clamp, not throw ByteBuffer's raw IllegalArgumentException
    // stripped of the 'malformed AVI' context
    val good = MediaCodecs.encodeAviMjpeg(4, 3, 2, 40000, _ => (x, y) => (x * 40 + y))
    val trailing = good ++ "JUNK".getBytes("US-ASCII") ++ le32(1) ++ Array[Byte](7)
    val frames = MediaCodecs.decodeAviFrames(trailing, 1)
    assert(frames.length == 2) // decodes normally; the clamped skip just ends the walk
    // meta walker: an AVI that is ONLY such a chunk must still fail with framing
    val body = "AVI ".getBytes("US-ASCII") ++
      "JUNK".getBytes("US-ASCII") ++ le32(1) ++ Array[Byte](7)
    val avi = "RIFF".getBytes("US-ASCII") ++ le32(body.length) ++ body
    val e = intercept[IllegalArgumentException](MediaCodecs.decodeAviMeta(avi))
    assert(e.getMessage.contains("no hdrl"), e.getMessage)
    val e2 = intercept[IllegalArgumentException](MediaCodecs.decodeAviFrames(avi, 1))
    assert(e2.getMessage.contains("no 00dc"), e2.getMessage)
  }
}
