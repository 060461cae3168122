package graft.multimodal

/** FLAC (subset): REAL entropy-coded LOSSLESS audio — the public FLAC
  * stream format (RFC 9639 / the xiph.org specification), implemented
  * pure-JVM for 16-bit PCM with independent channels.
  *
  * What this adds over the other audio codecs: G.711 is a memoryless
  * quantizer and IMA ADPCM a predictive quantizer — both LOSSY with
  * exact integer laws. FLAC is the remaining codec concept: fixed
  * linear prediction + RICE/GOLOMB entropy coding + bit-level container
  * framing with CRCs, and because it is LOSSLESS the cross-engine truth
  * is total (decoded samples ARE the source samples, so any oracle
  * aggregate is closed-form with no recurrence replay).
  *
  * Subset written by the encoder (all of it real FLAC any conforming
  * decoder reads): fLaC magic; STREAMINFO with real MD5 of the
  * unencoded samples; fixed-blocksize frames with explicit 16-bit
  * blocksize/samplerate header fields; UTF-8-coded frame numbers;
  * CRC-8-guarded headers and CRC-16-guarded frames; independent
  * channels; CONSTANT / VERBATIM / FIXED(0-4) subframes; rice residuals
  * (4-bit parameters, partition order 0) chosen by exact bit-cost.
  * The decoder reads beyond the written subset — any partition order,
  * the 5-bit rice method, rice escape codes, LPC SUBFRAMES of any order
  * (quantized coefficients ride the stream, so reconstruction is exact
  * integer arithmetic no matter how the encoder derived them — most
  * real-world FLAC is LPC-coded), WASTED BITS, and all three stereo
  * decorrelation modes (left/side, side/right, mid/side — exact integer
  * inverse transforms, 17-bit side channel), i.e. essentially any
  * 16-bit FLAC stream; reserved codes and non-16-bit streams REFUSE
  * loudly — the same parse-or-refuse contract as every other decoder
  * here (CodecFuzzLaws).
  *
  * No FLAC implementation exists in this sandbox to cross-validate
  * bit-level conformance, so the layout is pinned by construction
  * against the public specification plus round-trip, CRC and
  * known-answer laws in FlacCodecSpec.
  */
object FlacCodec {

  private def fail(what: String): Nothing =
    throw new IllegalArgumentException(s"malformed FLAC: $what")

  /** Absolute cap on decoded samples — the 36-bit STREAMINFO total and
    * per-frame block sizes are untrusted input (a corrupt CONSTANT
    * frame claims 4096 samples from ~20 bytes, so no byte-ratio bound
    * exists for an entropy-coded format).
    */
  private val MaxSamples = 1L << 26

  // ---- CRCs (FLAC polynomials, init 0, not reflected) ----

  private val Crc8Table: Array[Int] = Array.tabulate(256) { b =>
    var r = b
    var i = 0
    while (i < 8) { r = if ((r & 0x80) != 0) (r << 1) ^ 0x07 else r << 1; i += 1 }
    r & 0xFF
  }

  private val Crc16Table: Array[Int] = Array.tabulate(256) { b =>
    var r = b << 8
    var i = 0
    while (i < 8) { r = if ((r & 0x8000) != 0) (r << 1) ^ 0x8005 else r << 1; i += 1 }
    r & 0xFFFF
  }

  private[multimodal] def crc8(bytes: Array[Byte], from: Int, until: Int): Int = {
    var r = 0; var i = from
    while (i < until) { r = Crc8Table(r ^ (bytes(i) & 0xFF)); i += 1 }
    r
  }

  private[multimodal] def crc16(bytes: Array[Byte], from: Int, until: Int): Int = {
    var r = 0; var i = from
    while (i < until) {
      r = ((r << 8) ^ Crc16Table(((r >> 8) ^ (bytes(i) & 0xFF)) & 0xFF)) & 0xFFFF
      i += 1
    }
    r
  }

  // ---- bit IO ----

  private[multimodal] final class BitWriter {
    private val out = new java.io.ByteArrayOutputStream()
    private var acc = 0L
    private var nBits = 0
    def put(value: Long, bits: Int): Unit = {
      var b = bits
      var v = value & (if (bits == 64) -1L else (1L << bits) - 1)
      while (b > 0) {
        val take = math.min(b, 8 - nBits)
        acc = (acc << take) | ((v >>> (b - take)) & ((1L << take) - 1))
        nBits += take
        b -= take
        if (nBits == 8) { out.write(acc.toInt & 0xFF); acc = 0; nBits = 0 }
        v &= (if (b == 64) -1L else (1L << b) - 1)
      }
    }
    def putUnary(q: Int): Unit = { // q zero bits then a one bit
      var left = q
      while (left >= 32) { put(0L, 32); left -= 32 }
      put(1L, left + 1)
    }
    def align(): Unit = if (nBits > 0) put(0L, 8 - nBits)
    def bytes: Array[Byte] = { require(nBits == 0, "unaligned"); out.toByteArray }
    def size: Int = out.size()
  }

  private final class BitReader(bytes: Array[Byte], var pos: Int) {
    private var bit = 0 // bits consumed of bytes(pos)
    def bytePos: Int = pos
    def aligned: Boolean = bit == 0
    def get(bits: Int): Long = {
      var left = bits
      var v = 0L
      while (left > 0) {
        if (pos >= bytes.length) fail("truncated bitstream")
        val avail = 8 - bit
        val take = math.min(left, avail)
        val cur = (bytes(pos) & 0xFF) >>> (avail - take)
        v = (v << take) | (cur & ((1 << take) - 1))
        bit += take
        if (bit == 8) { bit = 0; pos += 1 }
        left -= take
      }
      v
    }
    def getSigned(bits: Int): Int = {
      val v = get(bits)
      ((v << (64 - bits)).toLong >> (64 - bits)).toInt
    }
    def getUnary(): Int = {
      var q = 0
      while (get(1) == 0L) {
        q += 1
        if (q > (bytes.length.toLong * 8)) fail("runaway unary code")
      }
      q
    }
    def align(): Unit = if (bit != 0) { bit = 0; pos += 1 }
  }

  // ---- fixed predictors (orders 0..4, the public FLAC coefficients) ----

  private def residual(s: Array[Int], base: Int, i: Int, order: Int): Long =
    order match {
      case 0 => s(base + i)
      case 1 => s(base + i).toLong - s(base + i - 1)
      case 2 => s(base + i).toLong - 2L * s(base + i - 1) + s(base + i - 2)
      case 3 => s(base + i).toLong - 3L * s(base + i - 1) +
        3L * s(base + i - 2) - s(base + i - 3)
      case _ => s(base + i).toLong - 4L * s(base + i - 1) +
        6L * s(base + i - 2) - 4L * s(base + i - 3) + s(base + i - 4)
    }

  private def zigzag(x: Long): Long = (x << 1) ^ (x >> 63)
  private def unzigzag(u: Long): Long = (u >>> 1) ^ -(u & 1L)

  private def riceCost(res: Array[Long], param: Int): Long = {
    var bits = 0L; var i = 0
    while (i < res.length) {
      bits += (zigzag(res(i)) >>> param) + 1 + param
      i += 1
    }
    bits
  }

  /** UTF-8-style coded number (the frame-number coding): k-byte form
    * carries 7-k lead-byte payload bits plus 6 per continuation byte
    * (7, 11, 16, 21, 26, 31, 36 payload bits for k = 1..7).
    */
  private def putCodedNumber(w: BitWriter, n: Long): Unit = {
    require(n >= 0 && n < (1L << 36), s"coded number $n out of 36-bit range")
    val nBytes =
      if (n < (1L << 7)) 1
      else if (n < (1L << 11)) 2
      else if (n < (1L << 16)) 3
      else if (n < (1L << 21)) 4
      else if (n < (1L << 26)) 5
      else if (n < (1L << 31)) 6
      else 7
    if (nBytes == 1) w.put(n, 8)
    else {
      val lead = ((0xFF << (8 - nBytes)) & 0xFF) |
        (n >>> (6 * (nBytes - 1))).toInt // 7-nBytes high payload bits
      w.put(lead.toLong, 8)
      var k = nBytes - 2
      while (k >= 0) {
        w.put(0x80L | ((n >>> (6 * k)) & 0x3F), 8)
        k -= 1
      }
    }
  }

  private def getCodedNumber(r: BitReader): Long = {
    val b0 = r.get(8).toInt
    if ((b0 & 0x80) == 0) b0.toLong
    else {
      var nBytes = 0
      var mask = 0x80
      while (nBytes < 8 && (b0 & mask) != 0) { nBytes += 1; mask >>= 1 }
      if (nBytes < 2 || nBytes > 7) fail(s"invalid coded-number lead byte $b0")
      var v = (b0 & (0x7F >> nBytes)).toLong
      var k = 1
      while (k < nBytes) {
        val b = r.get(8).toInt
        if ((b & 0xC0) != 0x80) fail("invalid coded-number continuation byte")
        v = (v << 6) | (b & 0x3F)
        k += 1
      }
      v
    }
  }

  // ---- encoder ----

  /** Encode interleaved 16-bit PCM as a FLAC stream (independent
    * channels, fixed block size).
    */
  def encodeFlac(channels: Int, sampleRate: Int, samples: Array[Short],
      blockSize: Int = 4096): Array[Byte] = {
    require(channels >= 1 && channels <= 8, s"channels $channels (FLAC allows 1..8)")
    require(sampleRate >= 1 && sampleRate <= 65535,
      s"sampleRate $sampleRate (subset writes the 16-bit header form)")
    require(blockSize >= 16 && blockSize <= 65535, s"blockSize $blockSize")
    require(samples.length % channels == 0,
      s"${samples.length} samples not a multiple of $channels channels")
    val frames = samples.length / channels
    require(frames >= 1, "FLAC needs at least one frame of audio")

    val md5 = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val b = java.nio.ByteBuffer.allocate(samples.length * 2)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      samples.foreach(b.putShort)
      md.digest(b.array())
    }

    val head = new BitWriter
    head.put('f', 8); head.put('L', 8); head.put('a', 8); head.put('C', 8)
    head.put(1L, 1)          // last metadata block
    head.put(0L, 7)          // STREAMINFO
    head.put(34L, 24)        // length
    head.put(blockSize.toLong, 16) // min block size
    head.put(blockSize.toLong, 16) // max block size
    head.put(0L, 24)         // min frame size (unknown)
    head.put(0L, 24)         // max frame size (unknown)
    head.put(sampleRate.toLong, 20)
    head.put((channels - 1).toLong, 3)
    head.put(15L, 5)         // bits per sample - 1
    head.put(frames.toLong, 36)
    md5.foreach(b => head.put((b & 0xFF).toLong, 8))

    val out = new java.io.ByteArrayOutputStream()
    out.write(head.bytes)

    // de-interleave once
    val chan = Array.tabulate(channels) { c =>
      Array.tabulate(frames)(f => samples(f * channels + c).toInt)
    }

    var frameNo = 0L
    var f0 = 0
    while (f0 < frames) {
      val n = math.min(blockSize, frames - f0)
      val w = new BitWriter
      w.put(0x3FFEL, 14)     // sync
      w.put(0L, 1)           // reserved
      w.put(0L, 1)           // fixed blocksize stream
      w.put(7L, 4)           // blocksize: 16-bit value - 1 at header end
      w.put(13L, 4)          // samplerate: 16-bit Hz at header end
      w.put((channels - 1).toLong, 4) // independent channels
      w.put(4L, 3)           // 16 bits per sample
      w.put(0L, 1)           // reserved
      putCodedNumber(w, frameNo)
      w.put((n - 1).toLong, 16)
      w.put(sampleRate.toLong, 16)
      val headerBytes = w.bytes // byte-aligned here by construction
      val h8 = crc8(headerBytes, 0, headerBytes.length)
      val body = new BitWriter
      headerBytes.foreach(b => body.put((b & 0xFF).toLong, 8))
      body.put(h8.toLong, 8)

      var c = 0
      while (c < channels) {
        writeSubframe(body, chan(c), f0, n)
        c += 1
      }
      body.align()
      val frameBytes = body.bytes
      val c16 = crc16(frameBytes, 0, frameBytes.length)
      out.write(frameBytes)
      out.write((c16 >> 8) & 0xFF)
      out.write(c16 & 0xFF)
      frameNo += 1
      f0 += n
    }
    out.toByteArray
  }

  /** One channel's subframe: cheapest of CONSTANT / VERBATIM / FIXED 0-4
    * by exact bit cost.
    */
  private def writeSubframe(w: BitWriter, s: Array[Int], base: Int, n: Int): Unit = {
    var allSame = true
    var i = 1
    while (allSame && i < n) { allSame = s(base + i) == s(base); i += 1 }
    if (allSame) {
      w.put(0L, 1); w.put(0L, 6); w.put(0L, 1) // CONSTANT, no wasted bits
      w.put(s(base).toLong & 0xFFFF, 16)
      return
    }
    // best fixed order + rice parameter by exact cost
    var bestOrder = -1; var bestParam = 0
    var bestBits = 16L * n // VERBATIM cost
    var order = 0
    while (order <= 4 && order < n) {
      val res = Array.tabulate(n - order)(i => residual(s, base, i + order, order))
      var p = 0
      while (p <= 14) {
        val bits = 16L * order + 2 + 4 + 4 + riceCost(res, p)
        if (bits < bestBits) { bestBits = bits; bestOrder = order; bestParam = p }
        p += 1
      }
      order += 1
    }
    if (bestOrder < 0) {
      w.put(0L, 1); w.put(1L, 6); w.put(0L, 1) // VERBATIM
      var i = 0
      while (i < n) { w.put(s(base + i).toLong & 0xFFFF, 16); i += 1 }
    } else {
      w.put(0L, 1); w.put((8 + bestOrder).toLong, 6); w.put(0L, 1) // FIXED k
      var i = 0
      while (i < bestOrder) { w.put(s(base + i).toLong & 0xFFFF, 16); i += 1 }
      w.put(0L, 2)  // residual method: 4-bit rice
      w.put(0L, 4)  // partition order 0
      w.put(bestParam.toLong, 4)
      i = bestOrder
      while (i < n) {
        val u = zigzag(residual(s, base, i, bestOrder))
        w.putUnary((u >>> bestParam).toInt)
        if (bestParam > 0) w.put(u & ((1L << bestParam) - 1), bestParam)
        i += 1
      }
    }
  }

  // ---- decoder ----

  /** Decode a FLAC stream (the subset above; any partition order and
    * both rice methods on read) to interleaved 16-bit PCM.
    */
  def decodeFlac(bytes: Array[Byte]): MediaCodecs.Wav = {
    if (bytes.length < 4 + 4 + 34) fail(s"only ${bytes.length} bytes")
    if (bytes(0) != 'f' || bytes(1) != 'L' || bytes(2) != 'a' || bytes(3) != 'C')
      fail("bad fLaC magic")
    val r = new BitReader(bytes, 4)
    // metadata blocks; STREAMINFO must be first
    var last = r.get(1) == 1L
    if (r.get(7) != 0L) fail("first metadata block is not STREAMINFO")
    if (r.get(24) != 34L) fail("STREAMINFO length != 34")
    val minBlock = r.get(16).toInt
    val maxBlock = r.get(16).toInt
    r.get(24); r.get(24) // frame size bounds (advisory)
    val sampleRate = r.get(20).toInt
    val channels = r.get(3).toInt + 1
    val bps = r.get(5).toInt + 1
    val totalFrames = r.get(36)
    r.get(64); r.get(64) // md5
    if (sampleRate < 1) fail(s"sample rate $sampleRate")
    if (bps != 16) fail(s"$bps bits/sample (subset decodes 16)")
    if (minBlock < 16 || maxBlock < minBlock) fail(
      s"block size bounds $minBlock..$maxBlock")
    if (totalFrames * channels > MaxSamples) fail(
      s"declared ${totalFrames}x$channels samples exceed $MaxSamples cap")
    while (!last) {
      last = r.get(1) == 1L
      r.get(7)
      val len = r.get(24).toInt
      // metadata blocks are byte-aligned; bound before skipping
      if (!r.aligned) fail("metadata block not byte-aligned")
      if (len > bytes.length - r.bytePos) fail("metadata block overruns payload")
      r.pos += len
    }

    val out = new Array[Short]((totalFrames * channels).toInt)
    var got = 0L // interleaved frames decoded
    while (got < totalFrames) {
      val frameStart = r.bytePos
      if (!r.aligned) fail("frame does not start byte-aligned")
      if (r.get(14) != 0x3FFEL) fail("bad frame sync")
      r.get(1) // reserved
      r.get(1) // blocking strategy
      val bsCode = r.get(4).toInt
      val srCode = r.get(4).toInt
      val chCode = r.get(4).toInt
      val bpsCode = r.get(3).toInt
      r.get(1)
      if (chCode > 10) fail(s"reserved channel assignment $chCode")
      val frameChannels = if (chCode <= 7) chCode + 1 else 2
      if (frameChannels != channels) fail(
        s"frame channels $frameChannels != STREAMINFO $channels")
      if (bpsCode != 4) fail(s"frame bps code $bpsCode (subset decodes 16-bit)")
      getCodedNumber(r)
      val n = bsCode match {
        case 1 => 192
        case c if c >= 2 && c <= 5 => 576 << (c - 2)
        case 6 => r.get(8).toInt + 1
        case 7 => r.get(16).toInt + 1
        case c if c >= 8 => 256 << (c - 8)
        case _ => fail(s"reserved block size code $bsCode")
      }
      srCode match {
        case 12 => r.get(8); ()
        case 13 | 14 => r.get(16); ()
        case c if c <= 11 => ()
        case other => fail(s"invalid sample rate code $other")
      }
      val declared8 = r.get(8).toInt
      if (!r.aligned) fail("frame header not byte-aligned before CRC-8")
      if (crc8(bytes, frameStart, r.bytePos - 1) != declared8)
        fail("frame header CRC-8 mismatch")
      if (n > maxBlock) fail(s"frame block size $n exceeds STREAMINFO max $maxBlock")
      if (got + n > totalFrames) fail(
        s"frames overrun STREAMINFO total ($got + $n > $totalFrames)")

      val block = Array.ofDim[Int](channels, n)
      var c = 0
      while (c < channels) {
        // the SIDE channel of a decorrelated pair carries l-r, which
        // needs one extra bit (the public channel-assignment rule)
        val sideBit = chCode match {
          case 8 | 10 => if (c == 1) 1 else 0 // left/side, mid/side
          case 9      => if (c == 0) 1 else 0 // side/right
          case _      => 0
        }
        readSubframe(r, block(c), n, 16 + sideBit)
        c += 1
      }
      // undo stereo decorrelation (exact integer transforms)
      if (chCode >= 8) {
        var f = 0
        while (f < n) {
          chCode match {
            case 8 =>  // left/side: r = l - s
              block(1)(f) = block(0)(f) - block(1)(f)
            case 9 =>  // side/right: l = r + s
              val s0 = block(0)(f)
              block(0)(f) = block(1)(f) + s0
            case _ =>  // mid/side: l+r = (mid<<1)|(s&1), l-r = s
              val m2 = (block(0)(f) << 1) | (block(1)(f) & 1)
              val sd = block(1)(f)
              block(0)(f) = (m2 + sd) >> 1
              block(1)(f) = (m2 - sd) >> 1
          }
          if (block(0)(f) < Short.MinValue || block(0)(f) > Short.MaxValue ||
              block(1)(f) < Short.MinValue || block(1)(f) > Short.MaxValue)
            fail(s"decorrelated sample outside 16-bit range at frame $f")
          f += 1
        }
      }
      r.align()
      val declared16 = (r.get(8).toInt << 8) | r.get(8).toInt
      if (crc16(bytes, frameStart, r.bytePos - 2) != declared16)
        fail("frame CRC-16 mismatch")
      var f = 0
      while (f < n) {
        c = 0
        while (c < channels) {
          out(((got + f) * channels + c).toInt) = block(c)(f).toShort
          c += 1
        }
        f += 1
      }
      got += n
    }
    MediaCodecs.Wav(channels, sampleRate, out)
  }

  private def readSubframe(r: BitReader, dst: Array[Int], n: Int, bps: Int): Unit = {
    if (r.get(1) != 0L) fail("subframe header pad bit set")
    val tpe = r.get(6).toInt
    // wasted bits: samples are coded at bps-k bits and shifted left k on
    // output (k is unary-coded as count-1 after a set flag)
    val wasted = if (r.get(1) == 1L) r.getUnary() + 1 else 0
    val eff = bps - wasted
    if (eff < 1) fail(s"$wasted wasted bits leave no sample bits of $bps")
    tpe match {
      case 0 =>
        val v = r.getSigned(eff)
        java.util.Arrays.fill(dst, 0, n, v)
      case 1 =>
        var i = 0
        while (i < n) { dst(i) = r.getSigned(eff); i += 1 }
      case t if t >= 8 && t <= 12 =>
        val order = t - 8
        if (order >= n) fail(s"fixed order $order >= block size $n")
        var i = 0
        while (i < order) { dst(i) = r.getSigned(eff); i += 1 }
        readResiduals(r, n, order)((i2, e) =>
          dst(i2) = reconstruct(dst, i2, order, e, eff))
      case t if t >= 32 =>
        // LPC subframe (type 1xxxxx, order = xxxxx + 1): quantized
        // coefficients ride the stream, so reconstruction is exact
        // integer arithmetic regardless of how the encoder derived them
        val order = (t & 31) + 1
        if (order >= n) fail(s"LPC order $order >= block size $n")
        var i = 0
        while (i < order) { dst(i) = r.getSigned(eff); i += 1 }
        val precM1 = r.get(4).toInt
        if (precM1 == 15) fail("reserved qlp precision code 15")
        val shift = r.getSigned(5)
        if (shift < 0) fail(s"negative qlp shift $shift")
        val qlp = Array.fill(order)(r.getSigned(precM1 + 1))
        val lo = -(1 << (eff - 1)); val hi = (1 << (eff - 1)) - 1
        readResiduals(r, n, order) { (i2, e) =>
          var acc = 0L
          var j = 0
          while (j < order) { acc += qlp(j).toLong * dst(i2 - 1 - j); j += 1 }
          val v = (acc >> shift) + e
          if (v < lo || v > hi) fail(
            s"reconstructed LPC sample $v outside $eff-bit range")
          dst(i2) = v.toInt
        }
      case other => fail(s"reserved subframe type $other")
    }
    if (wasted > 0) {
      var i = 0
      while (i < n) { dst(i) = dst(i) << wasted; i += 1 }
    }
  }

  /** Partitioned-rice residual section shared by FIXED and LPC
    * subframes: 2-bit method (4- or 5-bit rice parameters), 4-bit
    * partition order, escape code -> raw-bits residuals. `emit` is
    * called in sample order with the decoded residual.
    */
  private def readResiduals(r: BitReader, n: Int, order: Int)(
      emit: (Int, Long) => Unit): Unit = {
    val method = r.get(2).toInt
    if (method > 1) fail(s"reserved residual method $method")
    val pBits = if (method == 0) 4 else 5
    val escape = if (method == 0) 15 else 31
    val pOrder = r.get(4).toInt
    if ((n & ((1 << pOrder) - 1)) != 0) fail(
      s"block size $n not divisible into 2^$pOrder partitions")
    val perPart = n >> pOrder
    if (perPart <= order && pOrder > 0 || (pOrder == 0 && n <= order)) fail(
      s"partition size $perPart cannot hold order-$order warmup")
    var part = 0
    var i2 = order
    while (part < (1 << pOrder)) {
      val count = if (part == 0) perPart - order else perPart
      val param = r.get(pBits).toInt
      var k = 0
      if (param == escape) {
        val raw = r.get(5).toInt
        while (k < count) {
          emit(i2, if (raw == 0) 0L else r.getSigned(raw).toLong)
          i2 += 1; k += 1
        }
      } else {
        while (k < count) {
          val q = r.getUnary()
          val u = (q.toLong << param) |
            (if (param > 0) r.get(param) else 0L)
          emit(i2, unzigzag(u))
          i2 += 1; k += 1
        }
      }
      part += 1
    }
  }

  /** Invert the fixed predictor: sample = residual + prediction,
    * bounded by the subframe's effective bit depth (17 for a side
    * channel, less under wasted bits).
    */
  private def reconstruct(s: Array[Int], i: Int, order: Int, e: Long,
      eff: Int): Int = {
    val pred = order match {
      case 0 => 0L
      case 1 => s(i - 1).toLong
      case 2 => 2L * s(i - 1) - s(i - 2)
      case 3 => 3L * s(i - 1) - 3L * s(i - 2) + s(i - 3)
      case _ => 4L * s(i - 1) - 6L * s(i - 2) + 4L * s(i - 3) - s(i - 4)
    }
    val v = pred + e
    if (v < -(1L << (eff - 1)) || v > (1L << (eff - 1)) - 1) fail(
      s"reconstructed sample $v outside $eff-bit range")
    v.toInt
  }
}
