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
    // chunk walk: fmt may precede or follow auxiliary chunks (LIST, fact)
    var channels = -1; var sampleRate = -1
    var samples: Array[Short] = null
    while (b.remaining() >= 8 && (channels < 0 || samples == null)) {
      val id = fourcc()
      val size = b.getInt()
      if (size < 0 || size > b.remaining()) fail(s"chunk '$id' size $size overruns payload")
      id match {
        case "fmt " =>
          if (size < 16) fail(s"fmt chunk size $size < 16")
          val fmt = b.getShort()
          if (fmt != 1) fail(s"audio format $fmt (only PCM supported)")
          channels = b.getShort().toInt
          sampleRate = b.getInt()
          b.getInt(); b.getShort()
          val bits = b.getShort()
          if (bits != 16) fail(s"$bits bits/sample (only 16 supported)")
          if (channels < 1 || sampleRate < 1) fail(
            s"channels=$channels rate=$sampleRate")
          b.position(b.position() + size - 16)
        case "data" =>
          if (size % 2 != 0) fail(s"odd data chunk size $size")
          samples = new Array[Short](size / 2)
          var i = 0
          while (i < samples.length) { samples(i) = b.getShort(); i += 1 }
        case _ =>
          b.position(b.position() + size + (size & 1)) // chunks are word-aligned
      }
    }
    if (channels < 0) fail("no fmt chunk")
    if (samples == null) fail("no data chunk")
    if (samples.length % channels != 0) fail(
      s"${samples.length} samples not a multiple of $channels channels")
    Wav(channels, sampleRate, samples)
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

  /** Container sniff by magic bytes: "bmp", "wav", "y4m", or "unknown"
    * (the stub seam's territory — compressed codecs).
    */
  def sniff(payload: Array[Byte]): String =
    if (payload.length >= 2 && payload(0) == 'B' && payload(1) == 'M') "bmp"
    else if (payload.length >= 12 && payload(0) == 'R' && payload(1) == 'I' &&
      payload(2) == 'F' && payload(3) == 'F' && payload(8) == 'W' &&
      payload(9) == 'A' && payload(10) == 'V' && payload(11) == 'E') "wav"
    else if (payload.length >= 9 &&
      new String(payload, 0, 9, "US-ASCII") == "YUV4MPEG2") "y4m"
    else "unknown"
}
