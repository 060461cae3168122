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
  * frame's response flushes as it is processed); `scan` writes its
  * server-stream chunks as they pull from `toLocalIterator`, so a
  * snapshot never materializes on the driver.
  *
  * Dispatch runs on the stream's event-loop thread — per-stream ordering
  * for free, at the price of a Spark-action-latency stall for other
  * streams on the same loop (the group is sized `2×cores`); a
  * production deployment would hand dispatch to a bounded worker pool
  * exactly like [[HttpGateway]]'s.
  */
final class GrpcServer(op: GraftOperator, port: Int = 0,
    bindAddress: String = sys.env.getOrElse("GRAFT_BIND", "127.0.0.1"),
    txTtlMs: Long = sys.env.getOrElse("GRAFT_TX_TTL_MS", "600000").toLong) {

  private val svc = new GrpcService(op, txTtlMs)
  private val group = new NioEventLoopGroup()
  @volatile private var channel: Channel = _

  private final class StreamHandler extends ChannelInboundHandlerAdapter {
    private var rpc: Option[GrpcService.Rpc] = None
    private var badPath: String = ""
    private val reader = new GrpcWire.FrameReader()
    private var headersSent = false
    private var done = false

    private def respHeaders(): DefaultHttp2HeadersFrame = {
      val h = new DefaultHttp2Headers()
      h.status("200")
      h.set("content-type", "application/grpc")
      new DefaultHttp2HeadersFrame(h)
    }

    private def writeMsg(ctx: ChannelHandlerContext, payload: Array[Byte]): Unit = {
      if (!headersSent) { ctx.write(respHeaders()); headersSent = true }
      ctx.write(new DefaultHttp2DataFrame(
        Unpooled.wrappedBuffer(GrpcWire.frame(payload))))
    }

    private def finish(ctx: ChannelHandlerContext, status: Int,
        message: String = ""): Unit = {
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
    }

    override def channelRead(ctx: ChannelHandlerContext, msg: AnyRef): Unit =
      msg match {
        case h: Http2HeadersFrame =>
          val path = Option(h.headers.path).map(_.toString).getOrElse("")
          rpc = svc.method(path)
          if (rpc.isEmpty) badPath = path
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
            if (!done) reader.feed(bytes).foreach(m =>
              if (!done) dispatch(ctx, m))
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

    private def dispatch(ctx: ChannelHandlerContext, reqMsg: Array[Byte]): Unit =
      rpc match {
        case None =>
          finish(ctx, GrpcWire.StatusUnimplemented, s"unknown method $badPath")
        case Some(GrpcService.PerMessage(f)) =>
          writeMsg(ctx, f(reqMsg))
        case Some(GrpcService.ServerStream(f)) =>
          f(reqMsg).foreach { chunk => writeMsg(ctx, chunk); ctx.flush() }
      }

    private def endOfRequests(ctx: ChannelHandlerContext): Unit =
      if (!done) {
        if (rpc.isEmpty)
          finish(ctx, GrpcWire.StatusUnimplemented, s"unknown method $badPath")
        else if (!reader.isClean)
          finish(ctx, GrpcWire.StatusInternal, "stream ended mid-message")
        else finish(ctx, GrpcWire.StatusOk)
      }

    override def exceptionCaught(ctx: ChannelHandlerContext, e: Throwable): Unit = {
      e match {
        case g: GrpcException => finish(ctx, g.status, g.msg)
        case _ => finish(ctx, GrpcWire.StatusInternal,
          Option(e.getMessage).getOrElse(e.getClass.getName))
      }
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
    group.shutdownGracefully(0, 1, java.util.concurrent.TimeUnit.SECONDS)
      .syncUninterruptibly()
    ()
  }
}
