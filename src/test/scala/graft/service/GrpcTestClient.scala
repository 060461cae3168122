package graft.service

import java.util.concurrent.{CountDownLatch, TimeUnit}

import io.netty.bootstrap.Bootstrap
import io.netty.channel.{Channel, ChannelHandlerContext, ChannelInitializer,
  ChannelInboundHandlerAdapter}
import io.netty.channel.nio.NioEventLoopGroup
import io.netty.channel.socket.nio.NioSocketChannel
import io.netty.handler.codec.http2.{DefaultHttp2DataFrame,
  DefaultHttp2Headers, DefaultHttp2HeadersFrame, Http2DataFrame,
  Http2FrameCodecBuilder, Http2HeadersFrame, Http2MultiplexHandler,
  Http2StreamChannelBootstrap}

/** Minimal hand-rolled gRPC client for specs: one h2c connection, one
  * HTTP/2 stream per [[call]], real gRPC frames on the wire.
  */
final class GrpcTestClient(port: Int) {
  private val group = new NioEventLoopGroup(1)
  private val ch: Channel = {
    val b = new Bootstrap()
    b.group(group).channel(classOf[NioSocketChannel])
      .handler(new ChannelInitializer[Channel] {
        override def initChannel(c: Channel): Unit = {
          c.pipeline.addLast(Http2FrameCodecBuilder.forClient().build())
          c.pipeline.addLast(new Http2MultiplexHandler(
            new ChannelInboundHandlerAdapter)) // no server-push streams
          ()
        }
      })
    b.connect("127.0.0.1", port).syncUninterruptibly().channel()
  }

  /** The graft-wire-version response metadata of the latest call. */
  @volatile var lastWireVersion: String = ""

  /** One RPC: returns (response messages, grpc-status, grpc-message). */
  def call(path: String, messages: Seq[Array[Byte]],
      extraHeaders: Map[String, String] = Map.empty): (Seq[Array[Byte]], Int, String) = {
    val out = collection.mutable.ArrayBuffer.empty[Array[Byte]]
    @volatile var status = -1
    @volatile var statusMsg = ""
    val done = new CountDownLatch(1)
    val sb = new Http2StreamChannelBootstrap(ch)
    sb.handler(new ChannelInitializer[Channel] {
      override def initChannel(sc: Channel): Unit = {
        sc.pipeline.addLast(new ChannelInboundHandlerAdapter {
          private val reader = new GrpcWire.FrameReader()
          override def channelRead(ctx: ChannelHandlerContext, msg: AnyRef): Unit =
            msg match {
              case h: Http2HeadersFrame =>
                Option(h.headers.get("graft-wire-version"))
                  .foreach(v => lastWireVersion = v.toString)
                Option(h.headers.get("grpc-status")).foreach { s =>
                  status = s.toString.toInt
                  statusMsg = Option(h.headers.get("grpc-message"))
                    .map(_.toString).getOrElse("")
                }
                if (h.isEndStream) done.countDown()
              case d: Http2DataFrame =>
                val bytes = new Array[Byte](d.content.readableBytes())
                d.content.readBytes(bytes)
                val end = d.isEndStream
                d.release()
                out.synchronized { out ++= reader.feed(bytes) }
                if (end) done.countDown()
              case other =>
                io.netty.util.ReferenceCountUtil.release(other)
            }
        })
        ()
      }
    })
    val sc = sb.open().syncUninterruptibly().getNow
    val headers = new DefaultHttp2Headers()
    headers.method("POST").scheme("http").path(path)
      .authority(s"127.0.0.1:$port")
    headers.set("content-type", "application/grpc")
    headers.set("te", "trailers")
    extraHeaders.foreach { case (k, v) => headers.set(k, v) }
    sc.write(new DefaultHttp2HeadersFrame(headers, false))
    if (messages.isEmpty)
      sc.write(new DefaultHttp2DataFrame(true))
    else messages.zipWithIndex.foreach { case (m, i) =>
      sc.write(new DefaultHttp2DataFrame(
        io.netty.buffer.Unpooled.wrappedBuffer(GrpcWire.frame(m)),
        i == messages.size - 1))
    }
    sc.flush()
    require(done.await(60, TimeUnit.SECONDS), s"rpc $path timed out")
    (out.synchronized(out.toVector), status, statusMsg)
  }

  def close(): Unit = {
    ch.close().syncUninterruptibly()
    group.shutdownGracefully(0, 1, TimeUnit.SECONDS).syncUninterruptibly()
    ()
  }
}
