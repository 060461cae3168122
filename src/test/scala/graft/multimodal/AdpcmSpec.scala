package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** IMA ADPCM laws — REAL predictive compressed (4:1) audio whose
  * reconstruction chains a (predictor, step-index) state machine in
  * exact integer arithmetic. The spec replays the public IMA recurrence
  * with its own literal tables (independent of MediaCodecs' copies) and
  * pins: the encoder/decoder state lock-step, quantization error bounds
  * within a step's reach, index/predictor clamping, block-header
  * predictor exactness with cross-block index carry, and the WAV 0x11
  * container round trip for mono, stereo and partial final blocks.
  */
class AdpcmSpec extends AnyFunSuite {

  // independent replay of the public recurrence (typed here, not shared)
  private val Steps = Array(
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
    41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
    190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
    724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
    6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
    16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767)
  private val IdxTab = Array(-1, -1, -1, -1, 2, 4, 6, 8)

  private def replayDecode(code: Int, pred: Int, idx: Int): (Int, Int) = {
    val step = Steps(idx)
    var d = step >> 3
    if ((code & 4) != 0) d += step
    if ((code & 2) != 0) d += step >> 1
    if ((code & 1) != 0) d += step >> 2
    val p = math.max(-32768, math.min(32767, if ((code & 8) != 0) pred - d else pred + d))
    (p, math.max(0, math.min(88, idx + IdxTab(code & 7))))
  }

  test("decode step matches the independent replay for every (code, idx) " +
      "and a predictor sweep") {
    for (idx <- 0 to 88; code <- 0 to 15;
         pred <- Seq(-32768, -32767, -12345, -1, 0, 1, 7, 12345, 32766, 32767)) {
      assert(MediaCodecs.adpcmDecodeStep(code, pred, idx) ==
        replayDecode(code, pred, idx), s"code=$code pred=$pred idx=$idx")
    }
  }

  test("encoder advances through the decoder: state lock-step and bounded " +
      "quantization error within a step's reach") {
    val rnd = new scala.util.Random(41)
    var pred = 0; var idx = 0
    for (_ <- 0 until 20000) {
      val sample = rnd.nextInt(65536) - 32768
      val (code, p, i) = MediaCodecs.adpcmEncodeStep(sample, pred, idx)
      // lock-step: the encoder's state is EXACTLY the decoder's
      assert((p, i) == MediaCodecs.adpcmDecodeStep(code, pred, idx))
      val step = Steps(idx)
      // within the quantizer's reach (|diff| <= 15*step/8) and no clamp,
      // the reconstruction lands within half a quantization cell (step/8
      // granularity -> error < step/4 + the truncated eighth)
      val diff = math.abs(sample - pred)
      if (diff <= step + (step >> 1) + (step >> 2) && p > -32768 && p < 32767)
        assert(math.abs(p - sample) <= (step >> 2) + (step >> 3) + 1,
          s"sample=$sample pred=$pred idx=$idx step=$step p=$p")
      assert(i >= 0 && i <= 88 && p >= -32768 && p <= 32767)
      pred = p; idx = i
    }
  }

  test("saturation: an alternating full-scale input drives the index to " +
      "its 88 cap and clamps the predictor to int16, never beyond") {
    var pred = 0; var idx = 0; var maxIdx = 0
    var minP = 0; var maxP = 0
    for (k <- 0 until 400) { // +/-32767 alternation keeps |diff| huge
      val target = if (k % 2 == 0) 32767 else -32768
      val (_, p, i) = MediaCodecs.adpcmEncodeStep(target, pred, idx)
      assert(i >= 0 && i <= 88 && p >= -32768 && p <= 32767)
      maxIdx = math.max(maxIdx, i)
      minP = math.min(minP, p); maxP = math.max(maxP, p)
      pred = p; idx = i
    }
    assert(maxIdx == 88, s"alternating full-scale must reach the index cap, got $maxIdx")
    assert(minP == -32768, s"predictor must reach the negative clamp, got $minP")
    // the positive clamp engages on a DC ramp: each step overshoots by
    // diffq >= step/8 > 0, so convergence to +32767 must pass through it
    for (_ <- 0 until 400) {
      val (_, p, i) = MediaCodecs.adpcmEncodeStep(32767, pred, idx)
      assert(p <= 32767)
      pred = p; idx = i
    }
    assert(pred == 32767, s"DC full-scale must converge onto the clamp, got $pred")
    // converged DC input walks the index back DOWN (code 0 -> -1/step)
    for (_ <- 0 until 200) {
      val (_, p, i) = MediaCodecs.adpcmEncodeStep(0, pred, idx)
      pred = p; idx = i
    }
    assert(idx == 0 && math.abs(pred) <= 1, s"DC convergence: pred=$pred idx=$idx")
  }

  test("WAV 0x11 round trip equals an independent whole-stream replay: " +
      "mono + stereo, multi-block, partial final block") {
    for (ch <- Seq(1, 2); frames <- Seq(1, 64, 65, 66, 129, 200); spb <- Seq(9, 65)) {
      val pcm = Array.tabulate(frames * ch)(i => ((i * 2654435761L + 13) % 65536 - 32768).toShort)
      val wav = MediaCodecs.decodeWav(MediaCodecs.encodeWavAdpcm(ch, 8000, pcm, spb))
      assert(wav.channels == ch && wav.samples.length == frames * ch,
        s"ch=$ch frames=$frames spb=$spb")
      // independent replay: per-channel chain with block-header resets
      val pred = new Array[Int](ch); val idx = new Array[Int](ch)
      for (f <- 0 until frames; c <- 0 until ch) {
        val s = pcm(f * ch + c).toInt
        val dec =
          if (f % spb == 0) { pred(c) = s; s } // header: verbatim sample
          else {
            val step = Steps(idx(c))
            var diff = s - pred(c)
            var code = 0
            if (diff < 0) { code = 8; diff = -diff }
            if (diff >= step) { code |= 4; diff -= step }
            if (diff >= (step >> 1)) { code |= 2; diff -= step >> 1 }
            if (diff >= (step >> 2)) code |= 1
            val (p, i) = replayDecode(code, pred(c), idx(c))
            pred(c) = p; idx(c) = i
            p
          }
        assert(wav.samples(f * ch + c) == dec.toShort,
          s"ch=$ch frames=$frames spb=$spb f=$f c=$c")
      }
    }
  }

  test("block headers store the exact source sample; step index carries " +
      "across block boundaries (not reset)") {
    // a loud first block drives the index high; the second block's first
    // sample must be EXACT even though the index stays high
    val frames = 130
    val pcm = Array.tabulate(frames)(f =>
      (if (f < 65) (if (f % 2 == 0) 30000 else -30000) else 100 + f).toShort)
    val wav = MediaCodecs.decodeWav(MediaCodecs.encodeWavAdpcm(1, 8000, pcm, 65))
    assert(wav.samples(0) == pcm(0) && wav.samples(65) == pcm(65))
    // byte-level: block 2's header index (offset 44+36+4+32*... ) is high
    val bytes = MediaCodecs.encodeWavAdpcm(1, 8000, pcm, 65)
    val blockAlign = 4 + 32 // mono, spb 65
    val dataOff = bytes.length - 2 * blockAlign // 2 blocks
    val idx2 = bytes(dataOff + blockAlign + 2) & 0xFF
    assert(idx2 > 40, s"index after the loud block should be high, got $idx2")
  }

  test("corrupt ADPCM payloads refuse loudly") {
    val ok = MediaCodecs.encodeWavAdpcm(1, 8000,
      Array.tabulate(70)(i => (i * 441).toShort), 65)
    def err(mut: Array[Byte] => Unit): String = {
      val c = ok.clone(); mut(c)
      intercept[IllegalArgumentException](MediaCodecs.decodeWav(c)).getMessage
    }
    assert(err(b => b(34) = 8).contains("bits/sample"))         // wrong bits
    assert(err(b => b(32) = 5).contains("block align"))          // bad align
    // RIFF/WAVE(12) + fmt(8+20) -> fact chunk at 40, its value at 48;
    // 10 frames is before the final block of 2 x 65, so it must refuse
    assert(err(b => b(48) = 10.toByte).contains("fact"))
    // step index > 88 in a block header refuses
    assert(err(b => b(b.length - 2 * (4 + 32) + 2) = 120.toByte).contains("step index"))
  }
}
