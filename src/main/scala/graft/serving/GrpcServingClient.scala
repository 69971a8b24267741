package graft.serving

import java.util.concurrent.{CompletableFuture, TimeUnit}

import io.netty.bootstrap.Bootstrap
import io.netty.buffer.Unpooled
import io.netty.channel.{ChannelHandlerContext, ChannelInboundHandlerAdapter, ChannelInitializer, ChannelOption}
import io.netty.channel.nio.NioEventLoopGroup
import io.netty.channel.socket.nio.NioSocketChannel
import io.netty.handler.codec.http2._

import graft.serving.FeastProto.{EntityRowMsg, OnlineRequestMsg}

/** gRPC serving CLIENT — the reference SDK's `Client.get_online_features`
  * analog (`sdk/python/feast/client.py:1035-1107` builds a
  * `GetOnlineFeaturesRequestV2` and calls the serving stub; this does
  * the same over the hand-rolled [[FeastProto]] codecs and Netty's
  * HTTP/2 frame codec, since the environment has neither grpc-java nor
  * protobuf-java). Together with [[GrpcServingServer]] it closes the
  * remote-serving loop: an application JVM without Spark can read
  * features from a deployment's serving tier over the reference's own
  * wire protocol.
  *
  * One TCP connection, h2c prior knowledge; every call opens a fresh
  * HTTP/2 stream on it (multiplexed — calls may overlap from any
  * thread). Received DATA replenishes the flow-control window
  * (mirroring the server's review-r7 fix — a large response would
  * otherwise stall at 64 KB). Non-zero `grpc-status` raises
  * [[GrpcStatusException]] with the percent-decoded `grpc-message`.
  */
final class GrpcServingClient(host: String, port: Int, callTimeoutMs: Long = 15000) {

  private val group = new NioEventLoopGroup(1)
  private val channel = new Bootstrap()
    .group(group)
    .channel(classOf[NioSocketChannel])
    .option(ChannelOption.TCP_NODELAY, java.lang.Boolean.TRUE)
    .handler(new ChannelInitializer[io.netty.channel.socket.SocketChannel] {
      override def initChannel(ch: io.netty.channel.socket.SocketChannel): Unit = {
        ch.pipeline().addLast(Http2FrameCodecBuilder.forClient().build())
        // stream frames arrive on per-stream child channels
        ch.pipeline().addLast(new Http2MultiplexHandler(new ChannelInboundHandlerAdapter()))
        ()
      }
    })
    .connect(host, port).syncUninterruptibly().channel()


  /** Point read over the wire: feature refs as (table, name) pairs,
    * one entity row per lookup. Returns per row (values, statuses) —
    * entity keys echoed PRESENT first, then the requested features
    * with [[FeastProto.StatusPresent]] / StatusNotFound /
    * StatusOutsideMaxAge, exactly the server's FieldValues layout. */
  def getOnlineFeatures(
      features: Seq[(String, String)],
      entityRows: Seq[EntityRowMsg],
      project: Option[String] = None): Seq[(Map[String, Any], Map[String, Int])] =
    FeastProto.decodeOnlineResponse(call(
      "/feast.serving.ServingService/GetOnlineFeaturesV2",
      FeastProto.encodeOnlineRequest(OnlineRequestMsg(features, entityRows, project))))

  /** Convenience overload: refs as "view:feature" strings, rows as
    * plain key->value maps (the [[graft.store.FeatureStore
    * .getOnlineFeatures]] shape). */
  def getOnlineFeatures(
      featureRefs: Seq[String],
      rows: Seq[Map[String, Any]]): Seq[(Map[String, Any], Map[String, Int])] = {
    val refs = featureRefs.map { r =>
      r.split(":") match {
        case Array(t, f) => (t, f)
        case _ => throw new IllegalArgumentException(
          s"feature ref must be 'view:feature', got '$r'")
      }
    }
    getOnlineFeatures(refs, rows.map(m => EntityRowMsg(None, m.toSeq)))
  }

  /** (version, serving type enum — 1 = ONLINE). */
  def servingInfo(): (String, Int) =
    FeastProto.decodeServingInfo(call(
      "/feast.serving.ServingService/GetFeastServingInfo", Array.emptyByteArray))

  /** One unary call: open a stream, send headers + the framed message,
    * collect DATA + trailers, enforce grpc-status. */
  private def call(path: String, msg: Array[Byte]): Array[Byte] =
    try callImpl(path, msg)
    catch {
      case g: GrpcStatusException => throw g
      // stream open / write on a dead connection throws raw netty
      // channel exceptions — surface the typed UNAVAILABLE the caller
      // handles instead (review r12)
      case e: Exception => throw new GrpcStatusException(14,
        s"transport failure: ${Option(e.getMessage).getOrElse(e.getClass.getSimpleName)}", e)
    }

  private def callImpl(path: String, msg: Array[Byte]): Array[Byte] = {
    val done = new CompletableFuture[(Map[String, String], Array[Byte])]()
    // parent-connection death fails the call NOW (child-stream close
    // propagation is not guaranteed for handlers added around the close
    // window): hook the parent closeFuture for the call's duration
    val onParentClose = new io.netty.channel.ChannelFutureListener {
      override def operationComplete(f: io.netty.channel.ChannelFuture): Unit = {
        done.completeExceptionally(new GrpcStatusException(14,
          "connection closed mid-call"))
        ()
      }
    }
    channel.closeFuture().addListener(onParentClose)
    done.whenComplete((_, _) => { channel.closeFuture().removeListener(onParentClose); () })
    // a FRESH stream bootstrap per call: Http2StreamChannelBootstrap
    // holds its handler as mutable state, so sharing one across
    // concurrent calls races handler() against open() and wires a
    // stream to another call's future (caught by the ServingSpec
    // concurrency test — 8 overlapping lookups cross-wired)
    val open = new Http2StreamChannelBootstrap(channel)
      .handler(new ChannelInitializer[Http2StreamChannel] {
      override def initChannel(sc: Http2StreamChannel): Unit = {
        sc.pipeline().addLast(new ChannelInboundHandlerAdapter {
          private val buf = new java.io.ByteArrayOutputStream()
          private var headers = Map.empty[String, String]
          override def channelRead(ctx: ChannelHandlerContext, m: AnyRef): Unit = m match {
            case h: Http2HeadersFrame =>
              h.headers().forEach { e =>
                headers += (e.getKey.toString -> e.getValue.toString)
              }
              if (h.isEndStream) done.complete((headers, buf.toByteArray))
              ()
            case d: Http2DataFrame =>
              val bts = new Array[Byte](d.content().readableBytes())
              d.content().readBytes(bts)
              buf.write(bts)
              // replenish the window for consumed bytes — the frame
              // codec consumes nothing itself (same hazard the server
              // fixed in review r7); without this a >64 KB response
              // stalls forever
              val consumed = d.initialFlowControlledBytes()
              if (consumed > 0)
                ctx.writeAndFlush(
                  new DefaultHttp2WindowUpdateFrame(consumed).stream(d.stream()))
              val end = d.isEndStream
              d.release()
              if (end) done.complete((headers, buf.toByteArray))
              ()
            case r: Http2ResetFrame =>
              // server cancelled the stream: fail NOW as UNAVAILABLE
              // instead of parking the caller for the full deadline
              // (review r12)
              done.completeExceptionally(new GrpcStatusException(14,
                s"stream reset by peer (error ${r.errorCode})"))
              ()
            case _ => ()
          }
          override def channelInactive(ctx: ChannelHandlerContext): Unit = {
            // connection died mid-call (server stopped, TCP reset):
            // completing here surfaces a prompt UNAVAILABLE — without it
            // the caller blocked callTimeoutMs and then reported a
            // misleading deadline-exceeded (review r12)
            done.completeExceptionally(new GrpcStatusException(14,
              "connection closed mid-call"))
            ctx.fireChannelInactive()
            ()
          }
          override def exceptionCaught(ctx: ChannelHandlerContext, e: Throwable): Unit = {
            done.completeExceptionally(e)
            ctx.close()
            ()
          }
        })
        ()
      }
    }).open().syncUninterruptibly().getNow

    val hdrs = new DefaultHttp2Headers()
    hdrs.method("POST").path(path).scheme("http")
    hdrs.set("content-type", "application/grpc")
    hdrs.set("te", "trailers")
    // failed writes must complete the call NOW: a stream opened on an
    // already-dead connection never fires channelInactive on a handler
    // added after the close, so without these listeners the caller
    // blocked the full deadline and reported a misleading
    // deadline-exceeded (review r12)
    val failFast = new io.netty.channel.ChannelFutureListener {
      override def operationComplete(f: io.netty.channel.ChannelFuture): Unit = {
        if (!f.isSuccess) { done.completeExceptionally(f.cause); () }
      }
    }
    open.write(new DefaultHttp2HeadersFrame(hdrs, false)).addListener(failFast)
    open.writeAndFlush(new DefaultHttp2DataFrame(
      Unpooled.wrappedBuffer(GrpcWire.frame(msg)), true)).addListener(failFast)

    val (headers, body) =
      try done.get(callTimeoutMs, TimeUnit.MILLISECONDS)
      catch {
        case e: java.util.concurrent.TimeoutException =>
          // cancel the call like a deadline-exceeded gRPC client: RST
          // the stream so the server drops its buffered state
          open.write(new DefaultHttp2ResetFrame(Http2Error.CANCEL))
          open.flush()
          throw new GrpcStatusException(4, s"deadline exceeded after ${callTimeoutMs}ms", e)
        // unwrap handler-side completions (stream reset / connection
        // closed / pipeline exceptions) to the typed status the caller
        // handles, instead of a raw ExecutionException
        case e: java.util.concurrent.ExecutionException => e.getCause match {
          case g: GrpcStatusException => throw g
          case c => throw new GrpcStatusException(14,
            s"transport failure: ${Option(c.getMessage).getOrElse(c.getClass.getSimpleName)}", c)
        }
      }
    val status = headers.getOrElse("grpc-status", "2").toInt
    if (status != 0)
      throw new GrpcStatusException(status,
        GrpcWire.messageDecode(headers.getOrElse("grpc-message", "")))
    GrpcWire.unframe(body)
  }

  def close(): Unit = {
    channel.close().syncUninterruptibly()
    group.shutdownGracefully(0, 1, TimeUnit.SECONDS)
    ()
  }
}

/** Non-zero gRPC status from the server (or a client-side deadline,
  * status 4), message already percent-decoded. */
final class GrpcStatusException(val status: Int, message: String, cause: Throwable = null)
  extends RuntimeException(s"grpc-status $status: $message", cause)
