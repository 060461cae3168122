package graft.service

import io.netty.bootstrap.ServerBootstrap
import io.netty.buffer.Unpooled
import io.netty.channel.{Channel, ChannelHandlerContext, ChannelInitializer,
  ChannelInboundHandlerAdapter}
import io.netty.channel.nio.NioEventLoopGroup
import io.netty.channel.socket.nio.NioServerSocketChannel
import io.netty.handler.codec.http2.{DefaultHttp2DataFrame,
  DefaultHttp2Headers, DefaultHttp2HeadersFrame, Http2DataFrame,
  Http2FrameCodecBuilder, Http2HeadersFrame, Http2MultiplexHandler}

import graft.core.GraftOperator
import graft.service.GrpcWire.GrpcException

/** A real gRPC server for the reference's RPC protocol — gRPC's HTTP/2
  * wire format served by netty's http2 codec (reference:
  * rpc/src/main/proto/rpc.proto IngestService:122 / RetrieveService:387;
  * the reference's server is grpc-java, direct/ingest-server).
  *
  * The build ships no grpc-java and no protoc, so this speaks the
  * PROTOCOL itself: h2c (HTTP/2 prior knowledge) connections, requests
  * addressed by `:path = /<Service>/<method>`, messages as gRPC
  * length-prefixed frames ([[GrpcWire]]) carrying [[GrpcService]]'s
  * wire-compatible protobuf encodings, responses closed by trailers with
  * `grpc-status`/`grpc-message`. A stock generated client pointed at
  * this port with plaintext transport interoperates: same frames, same
  * field numbers, same status codes.
  *
  * Streaming: bidi ingest streams answer message-at-a-time (each request
  * frame's response flushes as it is processed); `scan` runs on a worker
  * thread and writes its server-stream chunks with write-future
  * backpressure — each chunk's write syncs against the HTTP/2
  * flow-control window before the next pulls from `toLocalIterator`, so
  * a slow client stalls the iterator instead of buffering the snapshot
  * in the outbound queue, and the snapshot never materializes on the
  * driver.
  *
  * Unary/per-message dispatch ALSO runs off the event loop: each stream
  * owns a serial task queue drained on the shared worker pool, so a
  * Spark-action-latency handler never stalls other streams on the same
  * loop while responses (and the closing trailers) still leave in
  * strict per-stream FIFO order.
  */
final class GrpcServer(op: GraftOperator, port: Int = 0,
    bindAddress: String = sys.env.getOrElse("GRAFT_BIND", "127.0.0.1"),
    txTtlMs: Long = sys.env.getOrElse("GRAFT_TX_TTL_MS", "600000").toLong,
    maxConcurrentScans: Int =
      sys.env.getOrElse("GRAFT_GATEWAY_MAX_SCANS", "4").toInt,
    txRegistry: Option[TxRegistry] = None) {

  private val svc = new GrpcService(op, txTtlMs, txRegistry = txRegistry)
  // same load-shedding contract as HttpGateway /scan: each streaming
  // scan pins a worker thread plus a toLocalIterator-driven Spark job
  // for the client's whole read — cap them, answer RESOURCE_EXHAUSTED
  // (the gRPC analog of 429) over the cap
  private val scanPermits =
    new java.util.concurrent.Semaphore(math.max(0, maxConcurrentScans))
  private val writeTimeoutMs =
    sys.env.getOrElse("GRAFT_GRPC_WRITE_TIMEOUT_MS", "60000").toLong
  private val group = new NioEventLoopGroup()
  // server-streaming rpcs run here, NOT on the event loop: their
  // backpressure wait (write-future sync against the HTTP/2 flow-control
  // window) would deadlock the loop that must service the window updates
  private val streamPool = java.util.concurrent.Executors.newCachedThreadPool(
    r => { val t = new Thread(r, "grpc-stream"); t.setDaemon(true); t })
  @volatile private var channel: Channel = _

  /** Per-stream serial executor: tasks run on [[streamPool]] one at a
    * time in submission order — per-stream FIFO without pinning a
    * thread per stream, and without blocking the event loop on a
    * Spark-action-latency handler.
    */
  private final class SerialExecutor {
    private val queue = new java.util.ArrayDeque[Runnable]()
    private var active = false
    def submit(task: Runnable): Unit = {
      val start = synchronized {
        queue.addLast(task)
        if (active) false else { active = true; true }
      }
      if (start) streamPool.execute(() => drain())
    }
    /** Pending tasks incl. the running one (the read-throttle signal). */
    def depth: Int = synchronized(queue.size + (if (active) 1 else 0))
    private def drain(): Unit = {
      var next = synchronized(queue.pollFirst())
      while (next != null) {
        try next.run() catch { case _: Throwable => () } // tasks self-report
        next = synchronized {
          val n = queue.pollFirst()
          if (n == null) active = false
          n
        }
      }
    }
  }

  private final class StreamHandler extends ChannelInboundHandlerAdapter {
    private var rpc: Option[GrpcService.Rpc] = None
    private var badPath: String = ""
    private var sawHeaders = false
    private var streaming = false // a ServerStream worker owns termination
    private val reader = new GrpcWire.FrameReader()
    private val serial = new SerialExecutor
    // read-throttle water marks on the serial queue depth
    private val HighWater = 64
    private val LowWater = 16
    // write-side state is shared between the event loop and the workers
    // — every mutation happens under the handler monitor
    private var headersSent = false
    private var done = false
    private var deadlineTask: java.util.concurrent.Future[_] = null

    private def respHeaders(): DefaultHttp2HeadersFrame = {
      val h = new DefaultHttp2Headers()
      h.status("200")
      h.set("content-type", "application/grpc")
      // wire-protocol self-description (custom metadata is legal gRPC and
      // invisible to stock clients): v2 = stamps in MILLISECONDS per
      // rpc.proto's documented unit (v1, rounds <10, sent micros). Lets a
      // client of the old surface detect the unit change at the wire
      // instead of by misdated data — see README "Protocol & API change
      // notes".
      h.set(GrpcServer.WireVersionKey, GrpcServer.WireVersion)
      new DefaultHttp2HeadersFrame(h)
    }

    /** Off-loop message write with REAL backpressure: returns once the
      * frame cleared the local flow-control window (write future), so a
      * slow scan client stalls the producing iterator instead of
      * buffering the whole snapshot in the outbound queue. The sync
      * happens OFF the handler monitor — the event loop must stay free
      * to process the client's window updates.
      */
    private def writeMsgSync(ctx: ChannelHandlerContext,
        payload: Array[Byte]): Unit = {
      val fut = this.synchronized {
        if (done) null
        else {
          if (!headersSent) { ctx.write(respHeaders()); headersSent = true }
          ctx.writeAndFlush(new DefaultHttp2DataFrame(
            Unpooled.wrappedBuffer(GrpcWire.frame(payload))))
        }
      }
      if (fut != null) {
        // bounded wait: a connected-but-not-reading client must not pin
        // this worker (and its scan permit) forever — past the deadline
        // the stream dies with DEADLINE_EXCEEDED and the channel closes
        if (!fut.await(writeTimeoutMs)) {
          ctx.close()
          throw GrpcWire.GrpcException(GrpcWire.StatusDeadlineExceeded,
            s"client did not consume the response within ${writeTimeoutMs}ms")
        }
        if (!fut.isSuccess) throw fut.cause()
      }
    }

    private def finish(ctx: ChannelHandlerContext, status: Int,
        message: String = ""): Unit = this.synchronized {
      if (done) return
      done = true
      val trailers = new DefaultHttp2Headers()
      if (!headersSent) {
        // trailers-only response (no messages were written)
        trailers.status("200")
        trailers.set("content-type", "application/grpc")
        headersSent = true
      }
      trailers.set("grpc-status", status.toString)
      if (message.nonEmpty)
        // percent-encode per spec for the characters that break a header
        trailers.set("grpc-message",
          message.replace("%", "%25").replace("\r", "%0D").replace("\n", "%0A"))
      ctx.write(new DefaultHttp2HeadersFrame(trailers, true))
      ctx.flush()
      if (deadlineTask != null) { deadlineTask.cancel(false); deadlineTask = null }
    }

    private def isDone: Boolean = this.synchronized(done)

    override def channelRead(ctx: ChannelHandlerContext, msg: AnyRef): Unit =
      msg match {
        case h: Http2HeadersFrame =>
          // only the FIRST headers frame carries the method — a later
          // trailers frame (a legal way to end the request stream) must
          // not clobber the resolved rpc into UNIMPLEMENTED
          if (!sawHeaders) {
            sawHeaders = true
            val path = Option(h.headers.path).map(_.toString).getOrElse("")
            rpc = svc.method(path)
            if (rpc.isEmpty) badPath = path
            // deadline propagation (gRPC grpc-timeout header, e.g. "250m"):
            // when the client's deadline passes, the stream closes with
            // DEADLINE_EXCEEDED — late responses are suppressed by the
            // done-guard and the scan loop stops at its next chunk
            Option(h.headers.get("grpc-timeout"))
              .flatMap(v => parseGrpcTimeoutNanos(v.toString)).foreach { ns =>
                val task = ctx.channel.eventLoop.schedule(
                  new Runnable {
                    override def run(): Unit =
                      finish(ctx, GrpcWire.StatusDeadlineExceeded,
                        "deadline exceeded")
                  },
                  ns, java.util.concurrent.TimeUnit.NANOSECONDS)
                this.synchronized { deadlineTask = task }
              }
          }
          if (h.isEndStream) endOfRequests(ctx)
        case d: Http2DataFrame =>
          try {
            val bytes = new Array[Byte](d.content.readableBytes())
            d.content.readBytes(bytes)
            val end = d.isEndStream
            d.release()
            // the done-guard inside the loop matters: an error finishing
            // the stream mid-chunk must not let later messages of the
            // same DATA frame write after the trailers
            if (!isDone) reader.feed(bytes).foreach(m =>
              if (!isDone) dispatch(ctx, m))
            ctx.flush()
            if (end) endOfRequests(ctx)
          } catch {
            case g: GrpcException => finish(ctx, g.status, g.msg)
            case e: Throwable => finish(ctx, GrpcWire.StatusInternal,
              Option(e.getMessage).getOrElse(e.getClass.getName))
          }
        case other =>
          io.netty.util.ReferenceCountUtil.release(other)
      }

    /** gRPC timeout header value: digits then a unit (H M S m u n). */
    private def parseGrpcTimeoutNanos(v: String): Option[Long] =
      GrpcWire.parseGrpcTimeoutNanos(v)

    private def maybeResumeReads(ctx: ChannelHandlerContext): Unit =
      if (serial.depth <= LowWater && !ctx.channel.config.isAutoRead) {
        val ch = ctx.channel
        ch.eventLoop.execute(() => { ch.config.setAutoRead(true); () })
      }

    private def failWith(ctx: ChannelHandlerContext, e: Throwable): Unit =
      e match {
        case g: GrpcException => finish(ctx, g.status, g.msg)
        case _ => finish(ctx, GrpcWire.StatusInternal,
          Option(e.getMessage).getOrElse(e.getClass.getName))
      }

    private def dispatch(ctx: ChannelHandlerContext, reqMsg: Array[Byte]): Unit =
      rpc match {
        case None =>
          serial.submit(() =>
            finish(ctx, GrpcWire.StatusUnimplemented, s"unknown method $badPath"))
        case Some(GrpcService.PerMessage(f)) =>
          // off the event loop, per-stream FIFO via the serial queue;
          // each response flushes as its handler completes. Inbound
          // BACKPRESSURE: when the queue outruns the worker (a client
          // streaming ingest at line rate vs Spark-write latency), the
          // stream's autoRead pauses — netty stops replenishing the
          // HTTP/2 flow-control window, the client stalls, and the
          // queue (each entry pinning a request payload) stays bounded
          serial.submit { () =>
            // writeMsgSync, not fire-and-forget: the inbound watermark
            // bounds PENDING requests only — a client that streams
            // requests but never reads responses would otherwise
            // accumulate every response in the outbound buffer
            // (HighWater-sized slugs per autoRead cycle, unbounded in
            // total) until the heap dies. Awaiting the write future
            // means a response must clear HTTP/2 flow control before
            // the next request is processed; a non-reading client
            // trips the bounded deadline instead.
            try { writeMsgSync(ctx, f(reqMsg)); () }
            catch { case e: Throwable => failWith(ctx, e) }
            finally maybeResumeReads(ctx)
          }
          if (serial.depth > HighWater)
            ctx.channel.config.setAutoRead(false)
        case Some(GrpcService.ServerStream(f)) =>
          if (!streaming) { // a second request message is protocol misuse
            streaming = true
            if (!scanPermits.tryAcquire())
              serial.submit(() => finish(ctx, GrpcWire.StatusResourceExhausted,
                s"too many concurrent scans (max $maxConcurrentScans)"))
            else serial.submit { () =>
              try {
                // takeWhile: a fired deadline (or any finished stream)
                // stops pulling chunks instead of scanning to the end
                f(reqMsg).takeWhile(_ => !isDone)
                  .foreach(chunk => writeMsgSync(ctx, chunk))
                finish(ctx, GrpcWire.StatusOk)
              } catch { case e: Throwable => failWith(ctx, e) }
              finally scanPermits.release()
            }
          }
      }

    private def endOfRequests(ctx: ChannelHandlerContext): Unit =
      if (streaming) () // the stream worker writes the trailers when drained
      else if (!isDone) {
        val unknown = rpc.isEmpty
        val clean = reader.isClean // read on the event loop, not the worker
        // the trailers task queues BEHIND every pending response task
        serial.submit { () =>
          if (unknown)
            finish(ctx, GrpcWire.StatusUnimplemented, s"unknown method $badPath")
          else if (!clean)
            finish(ctx, GrpcWire.StatusInternal, "stream ended mid-message")
          else finish(ctx, GrpcWire.StatusOk)
        }
      }

    override def exceptionCaught(ctx: ChannelHandlerContext, e: Throwable): Unit = {
      failWith(ctx, e)
      ctx.close(); ()
    }
  }

  def start(): GrpcServer = {
    val b = new ServerBootstrap()
    b.group(group)
      .channel(classOf[NioServerSocketChannel])
      .childHandler(new ChannelInitializer[Channel] {
        override def initChannel(ch: Channel): Unit = {
          ch.pipeline.addLast(Http2FrameCodecBuilder.forServer().build())
          ch.pipeline.addLast(new Http2MultiplexHandler(
            new ChannelInitializer[Channel] {
              override def initChannel(sc: Channel): Unit = {
                sc.pipeline.addLast(new StreamHandler); ()
              }
            }))
          ()
        }
      })
    channel = b.bind(bindAddress, port).syncUninterruptibly().channel()
    this
  }

  def boundPort: Int =
    channel.localAddress.asInstanceOf[java.net.InetSocketAddress].getPort

  def stop(): Unit = {
    if (channel != null) channel.close().syncUninterruptibly()
    streamPool.shutdownNow()
    group.shutdownGracefully(0, 1, java.util.concurrent.TimeUnit.SECONDS)
      .syncUninterruptibly()
    ()
  }
}

object GrpcServer {
  /** Custom response-metadata key advertising the wire protocol version. */
  val WireVersionKey = "graft-wire-version"

  /** v2: stamps on the wire are MILLISECONDS (rpc.proto's documented
    * unit); v1 (rounds <10) sent engine-native microseconds. Bump on any
    * further wire-visible change.
    */
  val WireVersion = "2"
}
