package graft.multimodal

import java.nio.{ByteBuffer, ByteOrder}

/** REAL pure-JVM codecs for the uncompressed media containers — BMP
  * (Windows V3, 24bpp, bottom-up, 4-byte row padding) and WAV (RIFF
  * PCM16) — written against the public format specs. These replace the
  * byte-derived fakes for every payload whose container is uncompressed:
  * the engine parses actual headers and decodes actual pixel/sample data.
  * Compressed codecs (JPEG/MP3/H.264) stay behind the documented
  * [[Multimodal.StubCodec]] seam — those decoders are native libraries a
  * real deployment links in; the *plumbing* they plug into is exercised
  * here with real containers.
  *
  * Every decoder validates magics, sizes and offsets and throws
  * `IllegalArgumentException` with the failing field — a truncated or
  * corrupt payload must fail the task loudly, not decode garbage.
  */
object MediaCodecs {

  /** Decoded 24bpp image: pixels row-major TOP-down, packed 0xRRGGBB. */
  final case class Bmp(width: Int, height: Int, pixels: Array[Int]) {
    def apply(x: Int, y: Int): Int = pixels(y * width + x)
  }

  /** Decoded PCM16 audio: samples frame-major, channel-interleaved. */
  final case class Wav(channels: Int, sampleRate: Int, samples: Array[Short]) {
    def nFrames: Int = samples.length / channels
    def durationMs: Long = nFrames * 1000L / sampleRate
  }

  private val FileHeaderBytes = 14
  private val InfoHeaderBytes = 40

  /** Hard ceiling on decoded pixel count (≈268 MB of packed ints) — rejects
    * hostile IHDR/header dims before any allocation happens.
    */
  private val MaxPixels = 1L << 26

  private def rowStride(width: Int): Int = ((width * 3 + 3) / 4) * 4

  /** Encode a 24bpp uncompressed BMP; `rgb(x, y)` returns packed
    * 0xRRGGBB with (0, 0) the TOP-LEFT pixel (rows are stored bottom-up
    * per the format).
    */
  def encodeBmp(width: Int, height: Int, rgb: (Int, Int) => Int): Array[Byte] = {
    require(width >= 1 && height >= 1, s"bmp dims must be >= 1: $width x $height")
    val stride = rowStride(width)
    val imageSize = stride * height
    val fileSize = FileHeaderBytes + InfoHeaderBytes + imageSize
    val b = ByteBuffer.allocate(fileSize).order(ByteOrder.LITTLE_ENDIAN)
    b.put('B'.toByte).put('M'.toByte)
    b.putInt(fileSize)
    b.putInt(0) // reserved
    b.putInt(FileHeaderBytes + InfoHeaderBytes) // pixel data offset
    b.putInt(InfoHeaderBytes)
    b.putInt(width)
    b.putInt(height) // positive height = bottom-up rows
    b.putShort(1)    // planes
    b.putShort(24)   // bpp
    b.putInt(0)      // BI_RGB, uncompressed
    b.putInt(imageSize)
    b.putInt(2835).putInt(2835) // 72 dpi in px/metre
    b.putInt(0).putInt(0)       // palette unused at 24bpp
    var fileRow = 0
    while (fileRow < height) {
      val y = height - 1 - fileRow // bottom-up
      var x = 0
      while (x < width) {
        val p = rgb(x, y)
        b.put((p & 0xff).toByte)         // B
        b.put(((p >> 8) & 0xff).toByte)  // G
        b.put(((p >> 16) & 0xff).toByte) // R
        x += 1
      }
      var pad = stride - width * 3
      while (pad > 0) { b.put(0.toByte); pad -= 1 }
      fileRow += 1
    }
    b.array()
  }

  def decodeBmp(bytes: Array[Byte]): Bmp = {
    def fail(what: String): Nothing =
      throw new IllegalArgumentException(s"malformed BMP: $what")
    if (bytes.length < FileHeaderBytes + InfoHeaderBytes) fail(
      s"only ${bytes.length} bytes, header needs ${FileHeaderBytes + InfoHeaderBytes}")
    val b = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    if (b.get() != 'B'.toByte || b.get() != 'M'.toByte) fail("bad magic")
    b.getInt(); b.getInt()
    val dataOffset = b.getInt()
    val infoSize = b.getInt()
    if (infoSize < InfoHeaderBytes) fail(s"info header size $infoSize < 40")
    val width = b.getInt()
    val height = b.getInt()
    if (width < 1 || height < 1) fail(s"dims $width x $height (top-down bmps unsupported)")
    if (width.toLong * height > MaxPixels)
      fail(s"dims $width x $height exceed $MaxPixels-pixel cap")
    b.getShort()
    val bpp = b.getShort()
    if (bpp != 24) fail(s"bpp $bpp (only 24bpp uncompressed supported)")
    val compression = b.getInt()
    if (compression != 0) fail(s"compression $compression (only BI_RGB supported)")
    val stride = rowStride(width)
    if (dataOffset < FileHeaderBytes + infoSize ||
      dataOffset.toLong + stride.toLong * height > bytes.length) fail(
      s"pixel data [$dataOffset, ${dataOffset.toLong + stride.toLong * height}) " +
        s"outside ${bytes.length}-byte payload")
    val px = new Array[Int](width * height)
    var fileRow = 0
    while (fileRow < height) {
      val y = height - 1 - fileRow
      var off = dataOffset + fileRow * stride
      var x = 0
      while (x < width) {
        val blue = bytes(off) & 0xff
        val green = bytes(off + 1) & 0xff
        val red = bytes(off + 2) & 0xff
        px(y * width + x) = (red << 16) | (green << 8) | blue
        off += 3
        x += 1
      }
      fileRow += 1
    }
    Bmp(width, height, px)
  }

  /** Nearest-neighbor resample: out(x, y) = src(x·sw div ow, y·sh div oh)
    * — the integer-exact sampling both engines can replay.
    */
  def resizeBmpNearest(src: Bmp, outW: Int, outH: Int): Bmp = {
    require(outW >= 1 && outH >= 1, s"resize dims must be >= 1: $outW x $outH")
    val px = new Array[Int](outW * outH)
    var y = 0
    while (y < outH) {
      val sy = y * src.height / outH
      var x = 0
      while (x < outW) {
        px(y * outW + x) = src(x * src.width / outW, sy)
        x += 1
      }
      y += 1
    }
    Bmp(outW, outH, px)
  }

  /** Encode RIFF/WAVE, PCM format 1, 16-bit; `samples` interleaved. */
  def encodeWav(channels: Int, sampleRate: Int, samples: Array[Short]): Array[Byte] = {
    require(channels >= 1, s"channels must be >= 1, got $channels")
    require(sampleRate >= 1, s"sampleRate must be >= 1, got $sampleRate")
    require(samples.length % channels == 0,
      s"${samples.length} samples not a multiple of $channels channels")
    val dataBytes = samples.length * 2
    val b = ByteBuffer.allocate(44 + dataBytes).order(ByteOrder.LITTLE_ENDIAN)
    b.put("RIFF".getBytes("US-ASCII"))
    b.putInt(36 + dataBytes)
    b.put("WAVE".getBytes("US-ASCII"))
    b.put("fmt ".getBytes("US-ASCII"))
    b.putInt(16)             // PCM fmt chunk size
    b.putShort(1)            // audio format: PCM
    b.putShort(channels.toShort)
    b.putInt(sampleRate)
    b.putInt(sampleRate * channels * 2) // byte rate
    b.putShort((channels * 2).toShort)  // block align
    b.putShort(16)           // bits per sample
    b.put("data".getBytes("US-ASCII"))
    b.putInt(dataBytes)
    var i = 0
    while (i < samples.length) { b.putShort(samples(i)); i += 1 }
    b.array()
  }

  // ---- G.711 companded audio (μ-law fmt 7 / A-law fmt 6): REAL
  // COMPRESSED telephony audio, 2:1, pure integer arithmetic (the classic
  // Sun reference algorithm), so unlike DCT codecs the quantization is
  // EXACTLY replayable cross-engine — encode∘decode is a closed-form
  // integer quantizer an oracle can re-derive per sample.

  private val MuBias = 0x84
  private val MuClip = 32635

  /** 16-bit PCM -> μ-law byte (0..255). */
  def muLawEncode(pcm: Int): Int = {
    var m = pcm
    val sign = if (m < 0) { m = -m; 0x80 } else 0
    if (m > MuClip) m = MuClip
    m += MuBias
    var e = 7
    var probe = 0x4000
    while (e > 0 && (m & probe) == 0) { e -= 1; probe >>= 1 }
    val mant = (m >> (e + 3)) & 0x0F
    ~(sign | (e << 4) | mant) & 0xFF
  }

  /** μ-law byte -> 16-bit PCM (exact inverse of the quantizer). */
  val muLawDecodeTable: Array[Short] = Array.tabulate(256) { b =>
    val u = ~b & 0xFF
    val sign = u & 0x80
    val e = (u >> 4) & 7
    val mant = u & 0x0F
    val mag = (((mant << 3) + MuBias) << e) - MuBias
    (if (sign != 0) -mag else mag).toShort
  }

  private val ALawClip = 32635

  /** 16-bit PCM -> A-law byte (0..255). Sun variant: negatives map to
    * magnitude -pcm - 8 (so -8..7 and 0 share the first step); MSB set
    * for POSITIVE values per the standard.
    */
  def aLawEncode(pcm: Int): Int = {
    var m = pcm
    val mask = if (m >= 0) 0xD5 else { m = -m - 8; 0x55 }
    if (m < 0) m = 0 // -1..-8 -> magnitude 0 under the Sun variant
    if (m > ALawClip) m = ALawClip
    val aval =
      if (m < 256) m >> 4
      else {
        var seg = 7
        var probe = 0x4000
        while (seg > 1 && (m & probe) == 0) { seg -= 1; probe >>= 1 }
        (seg << 4) | ((m >> (seg + 3)) & 0x0F)
      }
    (aval ^ mask) & 0xFF
  }

  /** A-law byte -> 16-bit PCM. Known anchors: 0xD5 -> +8, 0x55 -> -8. */
  val aLawDecodeTable: Array[Short] = Array.tabulate(256) { b =>
    val u = b ^ 0x55
    var t = (u & 0x0F) << 4
    val seg = (u >> 4) & 7
    if (seg == 0) t += 8
    else if (seg == 1) t += 0x108
    else t = (t + 0x108) << (seg - 1)
    (if ((b & 0x80) != 0) t else -t).toShort
  }

  /** Encode 16-bit PCM as a companded G.711 WAV: fmt tag 7 (μ-law) or 6
    * (A-law), 8 bits per sample — half the bytes of [[encodeWav]].
    */
  def encodeWavG711(channels: Int, sampleRate: Int, samples: Array[Short],
      aLaw: Boolean): Array[Byte] = {
    require(channels >= 1, s"channels must be >= 1, got $channels")
    require(sampleRate >= 1, s"sampleRate must be >= 1, got $sampleRate")
    require(samples.length % channels == 0,
      s"${samples.length} samples not a multiple of $channels channels")
    val dataBytes = samples.length
    val b = ByteBuffer.allocate(44 + dataBytes).order(ByteOrder.LITTLE_ENDIAN)
    b.put("RIFF".getBytes("US-ASCII"))
    b.putInt(36 + dataBytes)
    b.put("WAVE".getBytes("US-ASCII"))
    b.put("fmt ".getBytes("US-ASCII"))
    b.putInt(16)
    b.putShort(if (aLaw) 6 else 7)
    b.putShort(channels.toShort)
    b.putInt(sampleRate)
    b.putInt(sampleRate * channels)    // byte rate: 1 byte/sample
    b.putShort(channels.toShort)       // block align
    b.putShort(8)                      // bits per sample
    b.put("data".getBytes("US-ASCII"))
    b.putInt(dataBytes)
    var i = 0
    while (i < samples.length) {
      b.put((if (aLaw) aLawEncode(samples(i).toInt)
             else muLawEncode(samples(i).toInt)).toByte)
      i += 1
    }
    b.array()
  }

  // ---- IMA ADPCM (WAV format tag 0x11): PREDICTIVE compressed audio,
  // 4 bits per sample (4:1 vs 16-bit PCM). Unlike the MEMORYLESS G.711
  // quantizer, each sample's reconstruction depends on a running
  // (predictor, step-index) state machine — but the arithmetic is still
  // exact integers, so encode∘decode replays bit-identically in any
  // engine that chains the same public recurrence (the oracle replays it
  // as a recursive CTE). Tables and recurrence are the public IMA/DVI
  // specification used by every implementation.

  /** The 89-entry IMA step-size table. */
  val AdpcmStepTable: Array[Int] = Array(
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17,
    19, 21, 23, 25, 28, 31, 34, 37, 41, 45,
    50, 55, 60, 66, 73, 80, 88, 97, 107, 118,
    130, 143, 157, 173, 190, 209, 230, 253, 279, 307,
    337, 371, 408, 449, 494, 544, 598, 658, 724, 796,
    876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358,
    5894, 6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899,
    15289, 16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767)

  /** Step-index adjustment per 3-bit magnitude code. */
  val AdpcmIndexTable: Array[Int] = Array(-1, -1, -1, -1, 2, 4, 6, 8)

  /** One decoder step: 4-bit code + state -> (new predictor = the decoded
    * sample, new step index). THE recurrence — the encoder updates its
    * own state through this exact function, which is what makes
    * encode∘decode exact (predicting from the true residual instead
    * would let encoder and decoder state drift apart).
    */
  def adpcmDecodeStep(code: Int, predictor: Int, stepIndex: Int): (Int, Int) = {
    val step = AdpcmStepTable(stepIndex)
    var diffq = step >> 3
    if ((code & 4) != 0) diffq += step
    if ((code & 2) != 0) diffq += step >> 1
    if ((code & 1) != 0) diffq += step >> 2
    val p = if ((code & 8) != 0) predictor - diffq else predictor + diffq
    val clamped = math.max(-32768, math.min(32767, p))
    val idx = math.max(0, math.min(88, stepIndex + AdpcmIndexTable(code & 7)))
    (clamped, idx)
  }

  /** One encoder step: quantize `sample` against the state, returning
    * (4-bit code, new predictor, new step index) — state advanced via
    * [[adpcmDecodeStep]] so both sides stay in lock step.
    */
  def adpcmEncodeStep(sample: Int, predictor: Int, stepIndex: Int): (Int, Int, Int) = {
    val step = AdpcmStepTable(stepIndex)
    var diff = sample - predictor
    var code = 0
    if (diff < 0) { code = 8; diff = -diff }
    if (diff >= step) { code |= 4; diff -= step }
    if (diff >= (step >> 1)) { code |= 2; diff -= step >> 1 }
    if (diff >= (step >> 2)) code |= 1
    val (p, i) = adpcmDecodeStep(code, predictor, stepIndex)
    (code, p, i)
  }

  /** Encode 16-bit PCM as an IMA ADPCM WAV (fmt 0x11, 4 bits/sample).
    *
    * Block layout (the standard container framing): each block starts
    * with a 4-byte header PER CHANNEL — the block's first sample stored
    * VERBATIM as the predictor (int16), the current step index (uint8),
    * and a reserved byte — followed by the remaining `samplesPerBlock-1`
    * samples as nibbles (low nibble first), interleaved in 4-byte
    * (8-sample) groups per channel. The step index CARRIES across
    * blocks; the predictor resets exactly at each block header. A `fact`
    * chunk records the true frame count so the decoder trims the final
    * block's pad nibbles.
    *
    * `samplesPerBlock - 1` must be a multiple of 8 (whole 4-byte groups).
    */
  def encodeWavAdpcm(channels: Int, sampleRate: Int, samples: Array[Short],
      samplesPerBlock: Int): Array[Byte] = {
    require(channels >= 1, s"channels must be >= 1, got $channels")
    require(sampleRate >= 1, s"sampleRate must be >= 1, got $sampleRate")
    require(samples.length % channels == 0,
      s"${samples.length} samples not a multiple of $channels channels")
    require(samplesPerBlock >= 9 && (samplesPerBlock - 1) % 8 == 0,
      s"samplesPerBlock must be 8k+1 >= 9, got $samplesPerBlock")
    require(samples.length > 0, "ADPCM needs at least one frame")
    val frames = samples.length / channels
    val nBlocks = (frames + samplesPerBlock - 1) / samplesPerBlock
    val blockAlign = channels * (4 + (samplesPerBlock - 1) / 2)
    val dataBytes = nBlocks * blockAlign
    val b = ByteBuffer.allocate(12 + 8 + 20 + 8 + 4 + 8 + dataBytes)
      .order(ByteOrder.LITTLE_ENDIAN)
    b.put("RIFF".getBytes("US-ASCII"))
    b.putInt(4 + 8 + 20 + 8 + 4 + 8 + dataBytes)
    b.put("WAVE".getBytes("US-ASCII"))
    b.put("fmt ".getBytes("US-ASCII"))
    b.putInt(20)                       // 16 + cbSize(2) + wSamplesPerBlock(2)
    b.putShort(0x11)                   // IMA ADPCM
    b.putShort(channels.toShort)
    b.putInt(sampleRate)
    b.putInt((sampleRate.toLong * blockAlign / samplesPerBlock).toInt) // ~byte rate
    b.putShort(blockAlign.toShort)
    b.putShort(4)                      // bits per sample
    b.putShort(2)                      // cbSize
    b.putShort(samplesPerBlock.toShort)
    b.put("fact".getBytes("US-ASCII"))
    b.putInt(4)
    b.putInt(frames)                   // true frame count (trims pad nibbles)
    b.put("data".getBytes("US-ASCII"))
    b.putInt(dataBytes)
    val pred = new Array[Int](channels)
    val idx = new Array[Int](channels)
    var blk = 0
    while (blk < nBlocks) {
      val f0 = blk * samplesPerBlock
      var c = 0
      while (c < channels) {
        pred(c) = samples(f0 * channels + c).toInt // block's first sample, exact
        b.putShort(pred(c).toShort)
        b.put(idx(c).toByte)
        b.put(0.toByte)
        c += 1
      }
      var g = 0
      val groups = (samplesPerBlock - 1) / 8
      while (g < groups) {
        c = 0
        while (c < channels) {
          var k = 0
          while (k < 8) { // two samples per byte, low nibble first
            val fLo = f0 + 1 + g * 8 + k
            val fHi = fLo + 1
            def codeOf(f: Int): Int =
              if (f < frames) {
                val (code, p, i) = adpcmEncodeStep(
                  samples(f * channels + c).toInt, pred(c), idx(c))
                pred(c) = p; idx(c) = i
                code
              } else 0 // final-block pad; the fact count trims these
            val lo = codeOf(fLo)
            val hi = codeOf(fHi)
            b.put(((hi << 4) | lo).toByte)
            k += 2
          }
          c += 1
        }
        g += 1
      }
      blk += 1
    }
    b.array()
  }

  def decodeWav(bytes: Array[Byte]): Wav = {
    def fail(what: String): Nothing =
      throw new IllegalArgumentException(s"malformed WAV: $what")
    if (bytes.length < 12) fail(s"only ${bytes.length} bytes, RIFF header needs 12")
    val b = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    def fourcc(): String = {
      val a = new Array[Byte](4); b.get(a); new String(a, "US-ASCII")
    }
    if (fourcc() != "RIFF") fail("bad RIFF magic")
    b.getInt()
    if (fourcc() != "WAVE") fail("bad WAVE magic")
    // chunk walk: fmt may precede or follow auxiliary chunks (LIST, fact).
    // NOTE the fmt tag steers how a later data chunk is expanded, so a
    // data chunk BEFORE fmt is kept raw and expanded at the end.
    var channels = -1; var sampleRate = -1; var format = -1
    var blockAlign = -1; var samplesPerBlock = -1; var factFrames = -1
    var data: Array[Byte] = null
    var samples: Array[Short] = null
    while (b.remaining() >= 8 && (channels < 0 || data == null)) {
      val id = fourcc()
      val size = b.getInt()
      if (size < 0 || size > b.remaining()) fail(s"chunk '$id' size $size overruns payload")
      id match {
        case "fmt " =>
          if (size < 16) fail(s"fmt chunk size $size < 16")
          val fmt = b.getShort()
          if (fmt != 1 && fmt != 6 && fmt != 7 && fmt != 0x11) fail(
            s"audio format $fmt (PCM, A-law, mu-law and IMA ADPCM supported)")
          format = fmt
          channels = b.getShort().toInt
          sampleRate = b.getInt()
          b.getInt() // byte rate (advisory)
          blockAlign = b.getShort().toInt
          val bits = b.getShort()
          if (fmt == 1 && bits != 16) fail(s"$bits bits/sample (PCM needs 16)")
          if ((fmt == 6 || fmt == 7) && bits != 8) fail(s"$bits bits/sample (G.711 needs 8)")
          if (fmt == 0x11 && bits != 4) fail(s"$bits bits/sample (IMA ADPCM needs 4)")
          if (channels < 1 || sampleRate < 1) fail(
            s"channels=$channels rate=$sampleRate")
          if (fmt == 0x11 && size >= 20) {
            b.getShort() // cbSize
            samplesPerBlock = b.getShort().toInt
            b.position(b.position() + size - 20)
          } else b.position(b.position() + size - 16)
        case "fact" =>
          if (size >= 4) { factFrames = b.getInt(); b.position(b.position() + size - 4) }
          else b.position(b.position() + size)
          if ((size & 1) == 1 && b.remaining() >= 1) b.get()
        case "data" =>
          data = new Array[Byte](size)
          b.get(data)
          if ((size & 1) == 1 && b.remaining() >= 1) b.get() // word pad
        case _ =>
          b.position(b.position() + size + (size & 1)) // chunks are word-aligned
      }
    }
    if (data != null && format > 0) {
      format match {
        case 1 =>
          if (data.length % 2 != 0) fail(s"odd PCM data chunk size ${data.length}")
          samples = new Array[Short](data.length / 2)
          val db = ByteBuffer.wrap(data).order(ByteOrder.LITTLE_ENDIAN)
          var i = 0
          while (i < samples.length) { samples(i) = db.getShort(); i += 1 }
        case 6 | 7 =>
          val table = if (format == 6) aLawDecodeTable else muLawDecodeTable
          samples = new Array[Short](data.length)
          var i = 0
          while (i < samples.length) { samples(i) = table(data(i) & 0xFF); i += 1 }
        case 0x11 =>
          samples = decodeAdpcmData(data, channels, blockAlign,
            samplesPerBlock, factFrames, fail)
      }
    }
    if (channels < 0) fail("no fmt chunk")
    if (samples == null) fail("no data chunk")
    if (samples.length % channels != 0) fail(
      s"${samples.length} samples not a multiple of $channels channels")
    Wav(channels, sampleRate, samples)
  }

  /** Expand IMA ADPCM data blocks into interleaved 16-bit samples. */
  private def decodeAdpcmData(data: Array[Byte], channels: Int,
      blockAlign: Int, samplesPerBlockHdr: Int, factFrames: Int,
      fail: String => Nothing): Array[Short] = {
    if (blockAlign < channels * 4 + channels ||
        (blockAlign - channels * 4) % (channels * 4) != 0)
      fail(s"ADPCM block align $blockAlign cannot frame $channels channel(s)")
    // nibbles per channel per block; header field wins when present
    val derived = (blockAlign - 4 * channels) * 2 / channels + 1
    val spb = if (samplesPerBlockHdr > 0) samplesPerBlockHdr else derived
    if (spb != derived)
      fail(s"samplesPerBlock $spb disagrees with block align $blockAlign ($derived)")
    if (data.length % blockAlign != 0)
      fail(s"ADPCM data size ${data.length} not a multiple of block align $blockAlign")
    val nBlocks = data.length / blockAlign
    if (nBlocks == 0) fail("ADPCM data holds no blocks")
    val total = nBlocks * spb
    val frames =
      if (factFrames >= 0) {
        if (factFrames > total || factFrames <= (nBlocks - 1) * spb)
          fail(s"fact frame count $factFrames outside final block of $nBlocks x $spb")
        factFrames
      } else total
    val out = new Array[Short](frames * channels)
    val db = ByteBuffer.wrap(data).order(ByteOrder.LITTLE_ENDIAN)
    val pred = new Array[Int](channels)
    val idx = new Array[Int](channels)
    var blk = 0
    while (blk < nBlocks) {
      val f0 = blk * spb
      var c = 0
      while (c < channels) {
        pred(c) = db.getShort().toInt
        idx(c) = db.get() & 0xFF
        if (idx(c) > 88) fail(s"ADPCM step index ${idx(c)} > 88")
        db.get() // reserved
        if (f0 < frames) out(f0 * channels + c) = pred(c).toShort
        c += 1
      }
      var g = 0
      val groups = (spb - 1) / 8
      while (g < groups) {
        c = 0
        while (c < channels) {
          var k = 0
          while (k < 8) {
            val byte = db.get() & 0xFF
            var n = 0
            while (n < 2) {
              val code = if (n == 0) byte & 0x0F else byte >> 4
              val (p, i) = adpcmDecodeStep(code, pred(c), idx(c))
              pred(c) = p; idx(c) = i
              val f = f0 + 1 + g * 8 + k + n
              if (f < frames) out(f * channels + c) = p.toShort
              n += 1
            }
            k += 2
          }
          c += 1
        }
        g += 1
      }
      blk += 1
    }
    out
  }

  /** Decoded uncompressed video (YUV4MPEG2, C444): one w·h byte plane
    * per component per frame, frame-major Y,U,V order.
    */
  final case class Y4m(width: Int, height: Int, fpsNum: Int, fpsDen: Int,
      frames: Array[Array[Byte]]) {
    def nFrames: Int = frames.length
    def durationMs: Long = nFrames * 1000L * fpsDen / fpsNum
  }

  /** Encode YUV4MPEG2 (C444 chroma): `plane(f, p, i)` returns byte
    * 0-255 for frame f, plane p (0 = Y, 1 = U, 2 = V), linear pixel i.
    */
  def encodeY4m(width: Int, height: Int, fpsNum: Int, fpsDen: Int,
      nFrames: Int, plane: (Int, Int, Int) => Int): Array[Byte] = {
    require(width >= 1 && height >= 1, s"y4m dims must be >= 1: $width x $height")
    require(fpsNum >= 1 && fpsDen >= 1, s"fps must be positive: $fpsNum:$fpsDen")
    require(nFrames >= 0, s"nFrames must be >= 0, got $nFrames")
    val header =
      s"YUV4MPEG2 W$width H$height F$fpsNum:$fpsDen Ip A1:1 C444\n"
        .getBytes("US-ASCII")
    val wh = width * height
    val frameBytes = 6 + 3 * wh // "FRAME\n" + 3 full planes at C444
    val out = ByteBuffer.allocate(header.length + nFrames * frameBytes)
    out.put(header)
    val frameMagic = "FRAME\n".getBytes("US-ASCII")
    var f = 0
    while (f < nFrames) {
      out.put(frameMagic)
      var p = 0
      while (p < 3) {
        var i = 0
        while (i < wh) { out.put((plane(f, p, i) & 0xff).toByte); i += 1 }
        p += 1
      }
      f += 1
    }
    out.array()
  }

  def decodeY4m(bytes: Array[Byte]): Y4m = {
    def fail(what: String): Nothing =
      throw new IllegalArgumentException(s"malformed Y4M: $what")
    var pos = 0
    def readLine(): String = {
      val start = pos
      while (pos < bytes.length && bytes(pos) != '\n') pos += 1
      if (pos >= bytes.length) fail("unterminated header line")
      pos += 1
      new String(bytes, start, pos - 1 - start, "US-ASCII")
    }
    val header = readLine()
    val parts = header.split(" ")
    if (parts.head != "YUV4MPEG2") fail("bad magic")
    var w = -1; var h = -1; var num = -1; var den = -1; var chroma = "420"
    parts.tail.foreach { p =>
      if (p.nonEmpty) p.charAt(0) match {
        case 'W' => w = p.drop(1).toInt
        case 'H' => h = p.drop(1).toInt
        case 'F' => p.drop(1).split(":") match {
          case Array(n, d) => num = n.toInt; den = d.toInt
          case _ => fail(s"bad frame rate '$p'")
        }
        case 'C' => chroma = p.drop(1)
        case _ => () // Ip / A / X params: legal, irrelevant here
      }
    }
    if (w < 1 || h < 1) fail(s"dims $w x $h")
    // hostile header dims: without the cap, 3*w*h wraps Int — a
    // wrapped-NEGATIVE size trips copyOfRange, but a wrapped-POSITIVE
    // one silently accepts a frame with the wrong byte count
    if (w.toLong * h > MaxPixels) fail(s"dims $w x $h exceed $MaxPixels-pixel cap")
    if (num < 1 || den < 1) fail(s"frame rate $num:$den")
    if (chroma != "444") fail(s"chroma C$chroma (only C444 supported)")
    val wh = w * h
    val frames = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
    while (pos < bytes.length) {
      val line = readLine()
      if (!(line == "FRAME" || line.startsWith("FRAME "))) fail(
        s"expected FRAME marker at byte $pos, got '${line.take(16)}'")
      if (pos + 3 * wh > bytes.length) fail(
        s"frame ${frames.length} data overruns ${bytes.length}-byte payload")
      frames += java.util.Arrays.copyOfRange(bytes, pos, pos + 3 * wh)
      pos += 3 * wh
    }
    Y4m(w, h, num, den, frames.toArray)
  }

  // ---- PNG (ISO/IEC 15948): a REAL compressed still-image codec, pure
  // JDK — zlib via java.util.zip.{Deflater, Inflater}, CRC32 from the
  // same package. Supported: bit depth 8, color types 2 (RGB) and
  // 6 (RGBA, alpha dropped on decode), all five row filters, multiple
  // IDAT chunks, non-interlaced. Adam7 interlace and palette/gray types
  // throw loudly (extend rather than decode garbage).

  private val PngSig: Array[Byte] =
    Array(0x89.toByte, 'P', 'N', 'G', '\r', '\n', 0x1a, '\n')

  private def paeth(a: Int, b: Int, c: Int): Int = {
    val p = a + b - c
    val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
    if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
  }

  private def crcChunk(typ: String, data: Array[Byte]): Array[Byte] = {
    val out = ByteBuffer.allocate(12 + data.length).order(ByteOrder.BIG_ENDIAN)
    out.putInt(data.length)
    out.put(typ.getBytes("US-ASCII"))
    out.put(data)
    val crc = new java.util.zip.CRC32()
    crc.update(typ.getBytes("US-ASCII"))
    crc.update(data)
    out.putInt(crc.getValue.toInt)
    out.array()
  }

  /** Encode an 8-bit RGB PNG; `rgb(x, y)` returns packed 0xRRGGBB.
    * `filterType` (0-4) is applied to EVERY row — the spec-legal way to
    * exercise each defilter path with a payload any stock viewer opens.
    */
  def encodePng(width: Int, height: Int, rgb: (Int, Int) => Int,
      filterType: Int = 0): Array[Byte] = {
    require(width > 0 && height > 0, s"bad dims ${width}x$height")
    require(filterType >= 0 && filterType <= 4, s"bad filter $filterType")
    val stride = width * 3
    val raw = new Array[Byte](height * (1 + stride))
    val prev = new Array[Int](stride) // previous row, unfiltered, 0..255
    val cur = new Array[Int](stride)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        val px = rgb(x, y)
        cur(x * 3) = (px >> 16) & 0xff
        cur(x * 3 + 1) = (px >> 8) & 0xff
        cur(x * 3 + 2) = px & 0xff
        x += 1
      }
      val base = y * (1 + stride)
      raw(base) = filterType.toByte
      var i = 0
      while (i < stride) {
        val a = if (i >= 3) cur(i - 3) else 0
        val b = if (y > 0) prev(i) else 0
        val c = if (i >= 3 && y > 0) prev(i - 3) else 0
        val f = filterType match {
          case 0 => cur(i)
          case 1 => cur(i) - a
          case 2 => cur(i) - b
          case 3 => cur(i) - (a + b) / 2
          case 4 => cur(i) - paeth(a, b, c)
        }
        raw(base + 1 + i) = (f & 0xff).toByte
        i += 1
      }
      System.arraycopy(cur, 0, prev, 0, stride)
      y += 1
    }
    val deflater = new java.util.zip.Deflater()
    deflater.setInput(raw); deflater.finish()
    val zOut = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    while (!deflater.finished()) zOut.write(buf, 0, deflater.deflate(buf))
    deflater.end()
    val ihdr = ByteBuffer.allocate(13).order(ByteOrder.BIG_ENDIAN)
    ihdr.putInt(width).putInt(height)
    ihdr.put(8.toByte).put(2.toByte).put(0.toByte).put(0.toByte).put(0.toByte)
    val out = new java.io.ByteArrayOutputStream()
    out.write(PngSig)
    out.write(crcChunk("IHDR", ihdr.array()))
    out.write(crcChunk("IDAT", zOut.toByteArray))
    out.write(crcChunk("IEND", Array.emptyByteArray))
    out.toByteArray
  }

  /** Decode a PNG into the engine's packed-RGB image (RGBA alpha is
    * dropped). CRCs are verified per chunk; unsupported shapes throw.
    */
  def decodePng(bytes: Array[Byte]): Bmp = {
    def fail(what: String): Nothing =
      throw new IllegalArgumentException(s"malformed PNG: $what")
    if (bytes.length < 8 + 25 || !PngSig.indices.forall(i => bytes(i) == PngSig(i)))
      fail("bad signature")
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.BIG_ENDIAN)
    bb.position(8)
    var width = 0; var height = 0; var colorType = -1
    val idat = new java.io.ByteArrayOutputStream()
    var sawEnd = false
    while (!sawEnd) {
      if (bb.remaining() < 12) fail("truncated chunk")
      val len = bb.getInt
      if (len < 0 || len > bb.remaining() - 8) fail(s"bad chunk length $len")
      val typBytes = new Array[Byte](4); bb.get(typBytes)
      val typ = new String(typBytes, "US-ASCII")
      val data = new Array[Byte](len); bb.get(data)
      val crcWant = bb.getInt
      val crc = new java.util.zip.CRC32()
      crc.update(typBytes); crc.update(data)
      if (crc.getValue.toInt != crcWant) fail(s"CRC mismatch in $typ")
      typ match {
        case "IHDR" =>
          if (len != 13) fail("IHDR length")
          val h = ByteBuffer.wrap(data).order(ByteOrder.BIG_ENDIAN)
          width = h.getInt; height = h.getInt
          val bitDepth = h.get(); colorType = h.get()
          val compression = h.get(); val filterM = h.get(); val interlace = h.get()
          if (width <= 0 || height <= 0) fail(s"bad dims ${width}x$height")
          if (bitDepth != 8) fail(s"unsupported bit depth $bitDepth (only 8)")
          if (colorType != 2 && colorType != 6)
            fail(s"unsupported color type $colorType (only RGB/RGBA)")
          if (compression != 0 || filterM != 0) fail("bad compression/filter method")
          if (interlace != 0) fail("Adam7 interlace unsupported")
        case "IDAT" => idat.write(data)
        case "IEND" => sawEnd = true
        case _      => () // ancillary chunks skipped
      }
    }
    if (colorType < 0) fail("missing IHDR")
    if (idat.size() == 0) fail("missing IDAT")
    val bpp = if (colorType == 2) 3 else 4
    // IHDR dims are untrusted: without Long math a hostile width (~2^29)
    // overflows stride/rawLen to a negative array size, and a tiny payload
    // claiming huge dims would allocate GBs before the inflate fails. Bound
    // the claimed raw size by pixel cap AND by what the IDAT stream could
    // possibly inflate to (deflate's max expansion is ~1032:1).
    val strideL = width.toLong * bpp
    val rawLenL = height.toLong * (1L + strideL)
    if (width.toLong * height > MaxPixels)
      fail(s"dims ${width}x$height exceed $MaxPixels-pixel cap")
    if (rawLenL > idat.size().toLong * 1032L + 64L)
      fail(s"claimed raw size $rawLenL not producible from ${idat.size()}-byte IDAT")
    val stride = strideL.toInt
    val rawLen = rawLenL.toInt
    val raw = new Array[Byte](rawLen)
    val inflater = new java.util.zip.Inflater()
    inflater.setInput(idat.toByteArray)
    var off = 0
    try {
      while (off < rawLen && !inflater.finished()) {
        val n = inflater.inflate(raw, off, rawLen - off)
        if (n == 0 && inflater.needsInput()) fail("truncated IDAT stream")
        off += n
      }
    } catch {
      case e: java.util.zip.DataFormatException => fail(s"zlib: ${e.getMessage}")
    } finally inflater.end()
    if (off != rawLen) fail(s"decompressed $off bytes, expected $rawLen")
    val pixels = new Array[Int](width * height)
    val prev = new Array[Int](stride)
    val cur = new Array[Int](stride)
    var y = 0
    while (y < height) {
      val base = y * (1 + stride)
      val ft = raw(base) & 0xff
      if (ft > 4) fail(s"bad row filter $ft")
      var i = 0
      while (i < stride) {
        val x = raw(base + 1 + i) & 0xff
        val a = if (i >= bpp) cur(i - bpp) else 0
        val b = if (y > 0) prev(i) else 0
        val c = if (i >= bpp && y > 0) prev(i - bpp) else 0
        cur(i) = ft match {
          case 0 => x
          case 1 => (x + a) & 0xff
          case 2 => (x + b) & 0xff
          case 3 => (x + (a + b) / 2) & 0xff
          case 4 => (x + paeth(a, b, c)) & 0xff
        }
        i += 1
      }
      var px = 0
      while (px < width) {
        pixels(y * width + px) =
          (cur(px * bpp) << 16) | (cur(px * bpp + 1) << 8) | cur(px * bpp + 2)
        px += 1
      }
      System.arraycopy(cur, 0, prev, 0, stride)
      y += 1
    }
    Bmp(width, height, pixels)
  }

  // ---- JPEG / GIF via the JDK's bundled ImageIO plugins (part of every
  // JDK install — not an external native library): REAL decodes for the
  // two remaining common image containers. JPEG is LOSSY, so only its
  // HEADER fields (dims) are cross-engine-exact; GIF is palette-coded —
  // lossless whenever the image has <= 256 distinct colors (the gray
  // fixture encoder below guarantees it), so decoded pixels are exact.

  private lazy val headless: Unit = {
    // executors have no display; ImageIO's readers are headless-safe but
    // AWT color models initialize the toolkit lazily
    System.setProperty("java.awt.headless", "true")
    // ImageIO's DEFAULT stream cache is DISK-backed: every
    // read(InputStream) wraps in a FileCacheImageInputStream that creates
    // and deletes a temp FILE per image. Our payloads are already byte
    // arrays, so that is a pure tax — thousands of tmp-file round trips
    // per task at sf1, and the measured source of 2-4x order-dependent
    // swings on the JPEG/GIF bench rows (filesystem contention varies
    // with neighbors). Memory-backed caching decodes from the heap.
    javax.imageio.ImageIO.setUseCache(false)
  }

  /** Decode a JPEG or GIF payload via ImageIO into packed RGB. The
    * header dims are capped BEFORE `read` — they're untrusted, and the
    * JDK reader would otherwise allocate rasters for whatever the header
    * claims (an OutOfMemoryError, which no Exception handler catches).
    */
  def decodeImageIo(bytes: Array[Byte]): Bmp = {
    headless
    def fail(what: String): Nothing = throw new IllegalArgumentException(
      s"malformed ${sniff(bytes)}: $what")
    val iis = javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(bytes))
    val readers = javax.imageio.ImageIO.getImageReaders(iis)
    if (!readers.hasNext) fail("no ImageIO reader recognized it")
    val reader = readers.next()
    val img = try {
      reader.setInput(iis)
      val w = reader.getWidth(0); val h = reader.getHeight(0)
      if (w < 1 || h < 1 || w.toLong * h > MaxPixels)
        fail(s"dims ${w}x$h exceed $MaxPixels-pixel cap")
      reader.read(0)
    } catch {
      case e: IllegalArgumentException => throw e
      case e: Exception => fail(String.valueOf(e.getMessage))
    } finally { reader.dispose(); iis.close() } // dispose() does NOT close the stream
    val w = img.getWidth; val h = img.getHeight
    val pixels = new Array[Int](w * h)
    img.getRGB(0, 0, w, h, pixels, 0, w)
    var i = 0
    while (i < pixels.length) { pixels(i) &= 0xffffff; i += 1 }
    Bmp(w, h, pixels)
  }

  /** Encode a GRAYSCALE GIF — <= 256 distinct colors by construction, so
    * the palette round trip is LOSSLESS (fixture encoder for the oracle
    * rows; arbitrary-RGB GIF writes quantize and are NOT exact).
    */
  def encodeGifGray(width: Int, height: Int, gray: (Int, Int) => Int): Array[Byte] = {
    headless
    val img = new java.awt.image.BufferedImage(width, height,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        val g = gray(x, y) & 0xff
        img.setRGB(x, y, (g << 16) | (g << 8) | g)
        x += 1
      }
      y += 1
    }
    val out = new java.io.ByteArrayOutputStream()
    // NON-interlaced explicitly: the JDK GIF writer defaults to
    // interlaced, and the JDK GIF READER mis-places interlace passes for
    // heights < 8 (row scramble + a zero row at h=4 — observed, JDK 17)
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    val param = writer.getDefaultWriteParam
    param.setProgressiveMode(javax.imageio.ImageWriteParam.MODE_DISABLED)
    val ios = javax.imageio.ImageIO.createImageOutputStream(out)
    try {
      writer.setOutput(ios)
      writer.write(null, new javax.imageio.IIOImage(img, null, null), param)
    } finally { writer.dispose(); ios.close() }
    out.toByteArray
  }

  /** Encode a JPEG (REAL lossy DCT container; decoded pixels are
    * decoder-approximate — only header fields are cross-engine-exact).
    */
  def encodeJpeg(width: Int, height: Int, rgb: (Int, Int) => Int): Array[Byte] = {
    headless
    val img = new java.awt.image.BufferedImage(width, height,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) { img.setRGB(x, y, rgb(x, y) & 0xffffff); x += 1 }
      y += 1
    }
    val out = new java.io.ByteArrayOutputStream()
    require(javax.imageio.ImageIO.write(img, "jpeg", out), "no JPEG writer")
    out.toByteArray
  }

  /** Encode an ANIMATED grayscale GIF (lossless: <= 256 colors per
    * frame); `gray(frame, x, y)` returns 0..255. Non-interlaced — see
    * [[encodeGifGray]].
    */
  def encodeGifAnim(width: Int, height: Int, nFrames: Int,
      gray: (Int, Int, Int) => Int): Array[Byte] = {
    headless
    require(nFrames >= 1, s"nFrames must be >= 1, got $nFrames")
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    val param = writer.getDefaultWriteParam
    param.setProgressiveMode(javax.imageio.ImageWriteParam.MODE_DISABLED)
    val out = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(out)
    try {
      writer.setOutput(ios)
      writer.prepareWriteSequence(null)
      var f = 0
      while (f < nFrames) {
        val img = new java.awt.image.BufferedImage(width, height,
          java.awt.image.BufferedImage.TYPE_INT_RGB)
        var y = 0
        while (y < height) {
          var x = 0
          while (x < width) {
            val g = gray(f, x, y) & 0xff
            img.setRGB(x, y, (g << 16) | (g << 8) | g)
            x += 1
          }
          y += 1
        }
        writer.writeToSequence(new javax.imageio.IIOImage(img, null, null), param)
        f += 1
      }
      writer.endWriteSequence()
    } finally { writer.dispose(); ios.close() }
    out.toByteArray
  }

  /** Decode EVERY frame of a (possibly animated) GIF via the JDK's
    * bundled reader.
    */
  def decodeGifFrames(bytes: Array[Byte]): Array[Bmp] = {
    headless
    if (sniff(bytes) != "gif")
      throw new IllegalArgumentException("malformed GIF: bad magic")
    val reader = javax.imageio.ImageIO.getImageReadersByFormatName("gif").next()
    val iis = javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(bytes))
    try {
      reader.setInput(iis)
      val n = try reader.getNumImages(true) catch {
        case e: Exception =>
          throw new IllegalArgumentException(s"malformed GIF: ${e.getMessage}")
      }
      if (n < 1) throw new IllegalArgumentException("malformed GIF: no frames")
      Array.tabulate(n) { f =>
        val (fw, fh) = try (reader.getWidth(f), reader.getHeight(f)) catch {
          case e: Exception => throw new IllegalArgumentException(
            s"malformed GIF frame $f header: ${e.getMessage}")
        }
        // untrusted frame dims: cap before the reader allocates rasters
        // for whatever the header claims (OOM is an Error, not Exception)
        if (fw < 1 || fh < 1 || fw.toLong * fh > MaxPixels)
          throw new IllegalArgumentException(
            s"malformed GIF frame $f: dims ${fw}x$fh exceed $MaxPixels-pixel cap")
        val img = try reader.read(f) catch {
          case e: Exception => throw new IllegalArgumentException(
            s"malformed GIF frame $f: ${e.getMessage}")
        }
        val w = img.getWidth; val h = img.getHeight
        val pixels = new Array[Int](w * h)
        img.getRGB(0, 0, w, h, pixels, 0, w)
        var i = 0
        while (i < pixels.length) { pixels(i) &= 0xffffff; i += 1 }
        Bmp(w, h, pixels)
      }
    } finally { reader.dispose(); iis.close() } // dispose() does NOT close the stream
  }

  // ---- Motion-JPEG in AVI: REAL COMPRESSED video — a RIFF AVI container
  // (hand-rolled: hdrl with avih/strh/strf, movi with one '00dc' chunk per
  // frame) whose frames are real JPEGs (JDK ImageIO). Header truth (dims,
  // frame count, timing) is container-exact; frame PIXELS are
  // decoder-approximate like all JPEG output (see the imageStats caveat),
  // so oracles check header truth and specs bound the pixel error.

  /** AVI main-header truth: dims, per-frame micros, total frames. */
  final case class AviMeta(width: Int, height: Int, usPerFrame: Int,
      nFrames: Int)

  /** Encode an MJPEG AVI; `px(f)(x, y)` gives frame f's packed 0xRRGGBB. */
  def encodeAviMjpeg(width: Int, height: Int, nFrames: Int, usPerFrame: Int,
      px: Int => (Int, Int) => Int): Array[Byte] = {
    require(width >= 1 && height >= 1, s"dims ${width}x$height")
    require(nFrames >= 1, s"nFrames $nFrames")
    val frames = Array.tabulate(nFrames)(f => encodeJpeg(width, height, px(f)))
    val out = new java.io.ByteArrayOutputStream()
    def le32(v: Int): Array[Byte] = ByteBuffer.allocate(4)
      .order(ByteOrder.LITTLE_ENDIAN).putInt(v).array()
    def le16(v: Int): Array[Byte] = ByteBuffer.allocate(2)
      .order(ByteOrder.LITTLE_ENDIAN).putShort(v.toShort).array()
    def chunk(id: String, data: Array[Byte]): Array[Byte] = {
      val b = new java.io.ByteArrayOutputStream()
      b.write(id.getBytes("US-ASCII")); b.write(le32(data.length))
      b.write(data)
      if ((data.length & 1) == 1) b.write(0) // RIFF chunks are word-aligned
      b.toByteArray
    }
    def list(typ: String, body: Array[Byte]): Array[Byte] =
      chunk("LIST", typ.getBytes("US-ASCII") ++ body)
    val avih = {
      val b = ByteBuffer.allocate(56).order(ByteOrder.LITTLE_ENDIAN)
      b.putInt(usPerFrame).putInt(0).putInt(0)
        .putInt(0) // flags: no AVIF_HASINDEX — we write no idx1 chunk
      b.putInt(nFrames).putInt(0).putInt(1).putInt(0)
      b.putInt(width).putInt(height)
      b.array()
    }
    val strh = {
      val b = ByteBuffer.allocate(56).order(ByteOrder.LITTLE_ENDIAN)
      b.put("vids".getBytes("US-ASCII")).put("MJPG".getBytes("US-ASCII"))
      b.putInt(0).putShort(0).putShort(0).putInt(0)
      b.putInt(usPerFrame) // scale
      b.putInt(1000000)    // rate: frames/sec = rate/scale
      b.putInt(0).putInt(nFrames)
      b.array()
    }
    val strf = {
      val b = ByteBuffer.allocate(40).order(ByteOrder.LITTLE_ENDIAN)
      b.putInt(40).putInt(width).putInt(height)
      b.put(le16(1)).put(le16(24))
      b.put("MJPG".getBytes("US-ASCII"))
      b.putInt(width * height * 3)
      b.array()
    }
    val hdrl = list("hdrl",
      chunk("avih", avih) ++ list("strl", chunk("strh", strh) ++ chunk("strf", strf)))
    val movi = list("movi", frames.flatMap(f => chunk("00dc", f)))
    val body = "AVI ".getBytes("US-ASCII") ++ hdrl ++ movi
    out.write("RIFF".getBytes("US-ASCII")); out.write(le32(body.length))
    out.write(body)
    out.toByteArray
  }

  /** Parse the avih main header — container-exact truth, no frame decode. */
  def decodeAviMeta(bytes: Array[Byte]): AviMeta = {
    def fail(what: String): Nothing =
      throw new IllegalArgumentException(s"malformed AVI: $what")
    if (sniff(bytes) != "avi") fail("bad RIFF/AVI magic")
    val b = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    // an odd-sized chunk ending exactly at the payload's last byte has its
    // word-align pad byte PAST the buffer; clamping keeps the skip from
    // throwing ByteBuffer's raw IllegalArgumentException without the
    // 'malformed AVI' framing (the loop then just terminates)
    def seek(target: Int): Unit = b.position(math.min(target, b.limit()))
    b.position(12)
    while (b.remaining() >= 8) {
      val id = { val a = new Array[Byte](4); b.get(a); new String(a, "US-ASCII") }
      val size = b.getInt()
      if (size < 0 || size > b.remaining()) fail(s"chunk '$id' size $size overruns payload")
      if (id == "LIST") {
        if (size < 4) fail(s"LIST size $size cannot hold a list type")
        val typ = { val a = new Array[Byte](4); b.get(a); new String(a, "US-ASCII") }
        if (typ == "hdrl") {
          if (size < 4 + 8 + 40) fail(s"hdrl LIST size $size cannot hold avih")
          val cid = { val a = new Array[Byte](4); b.get(a); new String(a, "US-ASCII") }
          val csize = b.getInt()
          if (cid != "avih" || csize < 40) fail(s"hdrl starts with '$cid' ($csize B), expected avih")
          if (csize > size - 12) fail(s"avih size $csize overruns its hdrl LIST ($size)")
          val usPerFrame = b.getInt(); b.getInt(); b.getInt(); b.getInt()
          val nFrames = b.getInt(); b.getInt(); b.getInt(); b.getInt()
          val w = b.getInt(); val h = b.getInt()
          if (w < 1 || h < 1 || nFrames < 1) fail(s"dims ${w}x$h frames $nFrames")
          return AviMeta(w, h, usPerFrame, nFrames)
        } else seek(b.position() + size - 4 + (size & 1))
      } else seek(b.position() + size + (size & 1))
    }
    fail("no hdrl LIST")
  }

  /** Decode every `stride`-th MJPEG frame (real per-frame JPEG decode). */
  def decodeAviFrames(bytes: Array[Byte], stride: Int): Array[(Int, Bmp)] = {
    require(stride >= 1, s"stride must be >= 1, got $stride")
    def fail(what: String): Nothing =
      throw new IllegalArgumentException(s"malformed AVI: $what")
    if (sniff(bytes) != "avi") fail("bad RIFF/AVI magic")
    val b = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    // clamp pad skips: see decodeAviMeta's seek note
    def seek(target: Int): Unit = b.position(math.min(target, b.limit()))
    b.position(12)
    val out = scala.collection.mutable.ArrayBuffer.empty[(Int, Bmp)]
    var frameIdx = 0
    def walk(end: Int): Unit = {
      while (b.position() + 8 <= end) {
        val id = { val a = new Array[Byte](4); b.get(a); new String(a, "US-ASCII") }
        val size = b.getInt()
        // subtraction form: `position + size` overflows Int for hostile
        // sizes near MaxValue and would BYPASS the guard (then allocate
        // unboundedly below) — decodeAviMeta's remaining()-based idiom
        // is safe for the same reason
        if (size < 0 || size > end - b.position()) fail(s"chunk '$id' size $size overruns payload")
        if (id == "LIST") {
          if (size < 4) fail(s"LIST size $size cannot hold a list type")
          val typ = { val a = new Array[Byte](4); b.get(a); new String(a, "US-ASCII") }
          if (typ == "movi") {
            val listEnd = b.position() + size - 4
            walk(listEnd)
            seek(listEnd + (size & 1)) // skip sub-8-byte slack + pad
          } else seek(b.position() + size - 4 + (size & 1))
        } else if (id == "00dc") {
          if (frameIdx % stride == 0) {
            val data = new Array[Byte](size); b.get(data)
            out += ((frameIdx, decodeImageIo(data)))
          } else b.position(b.position() + size)
          if ((size & 1) == 1) seek(b.position() + 1)
          frameIdx += 1
        } else seek(b.position() + size + (size & 1))
      }
    }
    walk(bytes.length)
    if (frameIdx == 0) fail("no 00dc frames")
    out.toArray
  }

  /** Decode any supported still-image container to packed RGB. */
  def decodeImage(payload: Array[Byte]): Option[Bmp] = sniff(payload) match {
    case "bmp"          => Some(decodeBmp(payload))
    case "png"          => Some(decodePng(payload))
    case "jpeg" | "gif" => Some(decodeImageIo(payload))
    case _              => None
  }

  /** Container sniff by magic bytes: "bmp", "wav", "avi", "y4m", "png",
    * "jpeg", "gif", or "unknown" (the stub seam's territory — the
    * remaining native-library codecs, MP3/H.264).
    */
  def sniff(payload: Array[Byte]): String =
    if (payload.length >= 2 && payload(0) == 'B' && payload(1) == 'M') "bmp"
    else if (payload.length >= 12 && payload(0) == 'R' && payload(1) == 'I' &&
      payload(2) == 'F' && payload(3) == 'F' && payload(8) == 'W' &&
      payload(9) == 'A' && payload(10) == 'V' && payload(11) == 'E') "wav"
    else if (payload.length >= 12 && payload(0) == 'R' && payload(1) == 'I' &&
      payload(2) == 'F' && payload(3) == 'F' && payload(8) == 'A' &&
      payload(9) == 'V' && payload(10) == 'I' && payload(11) == ' ') "avi"
    else if (payload.length >= 9 &&
      new String(payload, 0, 9, "US-ASCII") == "YUV4MPEG2") "y4m"
    else if (payload.length >= 8 && PngSig.indices.forall(i => payload(i) == PngSig(i)))
      "png"
    else if (payload.length >= 3 && (payload(0) & 0xff) == 0xff &&
      (payload(1) & 0xff) == 0xd8 && (payload(2) & 0xff) == 0xff) "jpeg"
    else if (payload.length >= 4 && payload(0) == 'G' && payload(1) == 'I' &&
      payload(2) == 'F' && payload(3) == '8') "gif"
    else if (payload.length >= 4 && payload(0) == 'f' && payload(1) == 'L' &&
      payload(2) == 'a' && payload(3) == 'C') "flac"
    else "unknown"
}
