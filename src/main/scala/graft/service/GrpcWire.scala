package graft.service

/** gRPC wire-level message framing (the gRPC PROTOCOL-HTTP2 spec's
  * Length-Prefixed-Message): every RPC message travels as
  * `[1-byte compressed flag][4-byte big-endian length][payload]` inside
  * HTTP/2 DATA frames, with frame boundaries independent of message
  * boundaries. [[frame]] produces one framed message; [[FrameReader]]
  * incrementally re-assembles messages from an arbitrary chunking.
  *
  * The server never advertises a compression encoding, so a nonzero
  * compressed flag is a protocol error (grpc-status INTERNAL per spec).
  */
object GrpcWire {

  // canonical grpc-status codes used by this transport
  val StatusOk = 0
  val StatusUnknown = 2
  val StatusInvalidArgument = 3
  val StatusDeadlineExceeded = 4
  val StatusNotFound = 5
  val StatusResourceExhausted = 8
  val StatusUnimplemented = 12
  val StatusInternal = 13

  /** Raised by service logic to surface a specific grpc-status. */
  final case class GrpcException(status: Int, msg: String)
      extends RuntimeException(msg)

  /** `grpc-timeout` header value → nanos (PROTOCOL-HTTP2: 1-8 digits +
    * unit H/M/S/m/u/n). Saturating multiply: a spec-legal 8-digit hours
    * value (`99999999H`) would overflow to a NEGATIVE delay, firing the
    * deadline immediately and spuriously DEADLINE_EXCEEDED-ing the rpc.
    */
  def parseGrpcTimeoutNanos(v: String): Option[Long] =
    // 1-8 digits per spec; the bound also keeps `toLong` total
    if (v.length < 2 || v.length > 9 || !v.init.forall(_.isDigit)) None
    else {
      val n = v.init.toLong
      val unit = v.last match {
        case 'H' => Some(3600e9.toLong)
        case 'M' => Some(60e9.toLong)
        case 'S' => Some(1e9.toLong)
        case 'm' => Some(1000000L)
        case 'u' => Some(1000L)
        case 'n' => Some(1L)
        case _ => None
      }
      unit.map(u => if (n > Long.MaxValue / u) Long.MaxValue else n * u)
    }

  /** One Length-Prefixed-Message, uncompressed. */
  def frame(payload: Array[Byte]): Array[Byte] = {
    val out = new Array[Byte](5 + payload.length)
    out(0) = 0
    val n = payload.length
    out(1) = (n >>> 24).toByte; out(2) = (n >>> 16).toByte
    out(3) = (n >>> 8).toByte; out(4) = n.toByte
    System.arraycopy(payload, 0, out, 5, n)
    out
  }

  /** Incremental Length-Prefixed-Message reassembly: feed DATA-frame
    * chunks in arrival order, get back every message completed so far.
    * Single-stream state — one reader per HTTP/2 stream.
    */
  final class FrameReader(maxMessageBytes: Int = 64 << 20) {
    private var buf = Array.emptyByteArray

    def feed(chunk: Array[Byte]): Seq[Array[Byte]] = {
      buf =
        if (buf.isEmpty) chunk
        else {
          val merged = new Array[Byte](buf.length + chunk.length)
          System.arraycopy(buf, 0, merged, 0, buf.length)
          System.arraycopy(chunk, 0, merged, buf.length, chunk.length)
          merged
        }
      val out = Vector.newBuilder[Array[Byte]]
      var off = 0
      var more = true
      while (more && buf.length - off >= 5) {
        if (buf(off) != 0)
          throw GrpcException(StatusInternal,
            "compressed message received but no grpc-encoding negotiated")
        val len = ((buf(off + 1) & 0xFF) << 24) | ((buf(off + 2) & 0xFF) << 16) |
          ((buf(off + 3) & 0xFF) << 8) | (buf(off + 4) & 0xFF)
        if (len < 0 || len > maxMessageBytes)
          throw GrpcException(StatusResourceExhausted,
            s"message of $len bytes exceeds limit $maxMessageBytes")
        if (buf.length - off - 5 >= len) {
          out += java.util.Arrays.copyOfRange(buf, off + 5, off + 5 + len)
          off += 5 + len
        } else more = false
      }
      buf = if (off == 0) buf else java.util.Arrays.copyOfRange(buf, off, buf.length)
      out.result()
    }

    /** True when no partial message is pending (stream may end here). */
    def isClean: Boolean = buf.isEmpty
  }
}
