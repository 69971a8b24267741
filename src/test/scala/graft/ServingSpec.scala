package graft

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.sql.Timestamp
import java.time.Duration

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.model._
import graft.online.InMemoryOnlineStore
import graft.registry.Registry
import graft.serving.ServingServer
import graft.store.FeatureStore
import graft.util.Json
import graft.util.JValue._

/** HTTP serving endpoint over the online read path (the gRPC
  * GetOnlineFeaturesV2 analog): health check, happy path with
  * PRESENT/NOT_FOUND statuses, type-coercion via O16, and the
  * error path for malformed requests. */
class ServingSpec extends AnyFunSuite {

  lazy val spark: SparkSession = {
    val s = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    graft.sources.Tables.configure(s)
    s
  }

  private def ts(s: String) = Timestamp.valueOf(s)

  test("online derived features: evaluated job-free, null inputs read back NOT_FOUND") {
    import spark.implicits._
    val df = Seq(
      (1L, ts("2024-01-10 00:00:00"), 10.0, 0.2),
      (2L, ts("2024-01-10 00:00:00"), 4.0, 0.5))
      .toDF("user_id", "event_ts", "qty", "disc")
    val fs = new FeatureStore("drv_test", new Registry(),
      new InMemoryOnlineStore(), spark)
    fs.applyEntity(Entity("user", GraftType.Int64, joinKeyOpt = Some("user_id")))
    fs.applyFeatureView(FeatureView("purchases", Seq("user"),
      Seq(Feature("qty", GraftType.Dbl), Feature("disc", GraftType.Dbl)),
      Duration.ZERO, DataFrameSource(df, eventTimestampColumn = "event_ts")))
    fs.materialize(Seq("purchases"), ts("2024-01-01 00:00:00"), ts("2024-02-01 00:00:00"))
    val svc = FeatureService("svc",
      Seq(FeatureViewProjection("purchases", Seq("qty", "disc"))),
      derived = Seq(DerivedFeature("net_qty", "qty * (1.0 - disc)")))
    fs.applyFeatureService(svc)

    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      val resp = fs.getOnlineFeatures(svc,
        Seq(Map("user_id" -> 1L), Map("user_id" -> 2L), Map("user_id" -> 99L)))
      // listener events are async; a job-start event for anything this
      // test ran would land well within this window
      Thread.sleep(300)
      assert(jobs.get() === 0, "derived online evaluation must not schedule a Spark job")
      assert(resp.toMap("net_qty") === Seq(8.0, 2.0, null))
      assert(resp.statuses("net_qty") === Seq("PRESENT", "PRESENT", "NOT_FOUND"))
      // base features unaffected
      assert(resp.statuses("purchases:qty") === Seq("PRESENT", "PRESENT", "NOT_FOUND"))
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("serving endpoint: health, reads with statuses, O16 coercion, bad request") {
    import spark.implicits._
    val df = Seq(
      (1L, ts("2024-01-01 10:00:00"), 0.7, "us"),
      (2L, ts("2024-01-02 10:00:00"), 0.9, "de"))
      .toDF("driver_id", "et", "conv_rate", "region")
    val fs = new FeatureStore("srv", new Registry(), new InMemoryOnlineStore(), spark)
    fs.applyEntity(Entity("driver", GraftType.Int64, Some("driver_id")))
    fs.applyFeatureView(FeatureView("stats", Seq("driver"),
      Seq(Feature("conv_rate", GraftType.Dbl), Feature("region", GraftType.Str)),
      Duration.ZERO, DataFrameSource(df, "et")))
    fs.materialize(Seq("stats"), ts("2024-01-01 00:00:00"), ts("2024-01-03 00:00:00"))

    val server = new ServingServer(fs).start()
    val base = s"http://localhost:${server.boundPort}"
    val client = HttpClient.newHttpClient()
    try {
      val health = client.send(
        HttpRequest.newBuilder(URI.create(s"$base/health")).GET().build(),
        HttpResponse.BodyHandlers.ofString())
      assert(health.statusCode() == 200 && health.body().contains("SERVING"))

      // JSON integral numbers arrive as Long; 99 is missing -> NOT_FOUND
      val req =
        """{"features": ["stats:conv_rate", "stats:region"],
          |"entity_rows": [{"driver_id": 1}, {"driver_id": 2}, {"driver_id": 99}]}""".stripMargin
      val resp = client.send(
        HttpRequest.newBuilder(URI.create(s"$base/get-online-features"))
          .POST(HttpRequest.BodyPublishers.ofString(req)).build(),
        HttpResponse.BodyHandlers.ofString())
      assert(resp.statusCode() == 200, resp.body())
      val o = Json.parse(resp.body()).asInstanceOf[JObj]
      val conv = (o("field_values").asInstanceOf[JObj]("stats:conv_rate"): @unchecked) match {
        case JArr(xs) => xs
      }
      assert(conv == Vector(JNum(0.7), JNum(0.9), JNull))
      val regionStatus = (o("statuses").asInstanceOf[JObj]("stats:region"): @unchecked) match {
        case JArr(xs) => xs.map(_.asInstanceOf[JStr].v)
      }
      assert(regionStatus == Vector("PRESENT", "PRESENT", "NOT_FOUND"))

      // wrong-typed key -> 400 with the O16 error, not a silent NOT_FOUND
      val bad = client.send(
        HttpRequest.newBuilder(URI.create(s"$base/get-online-features"))
          .POST(HttpRequest.BodyPublishers.ofString(
            """{"features": ["stats:conv_rate"], "entity_rows": [{"driver_id": "one"}]}"""))
          .build(),
        HttpResponse.BodyHandlers.ofString())
      assert(bad.statusCode() == 400 && bad.body().contains("expects INT64"))

      // malformed JSON -> 400
      val junk = client.send(
        HttpRequest.newBuilder(URI.create(s"$base/get-online-features"))
          .POST(HttpRequest.BodyPublishers.ofString("{not json")).build(),
        HttpResponse.BodyHandlers.ofString())
      assert(junk.statusCode() == 400)
    } finally {
      server.stop()
      fs.teardown()
    }
  }

  /** Minimal HTTP/2 gRPC client over netty (the same jars the server
    * uses): one unary call, returns (merged headers incl. trailers,
    * raw DATA payload). Exists because no grpc-java client is
    * available in this environment — this drives the REAL wire. */
  private def grpcCall(port: Int, path: String,
      msg: Array[Byte]): (Map[String, String], Array[Byte]) = {
    import io.netty.bootstrap.Bootstrap
    import io.netty.buffer.Unpooled
    import io.netty.channel.{ChannelHandlerContext, ChannelInboundHandlerAdapter, ChannelInitializer}
    import io.netty.channel.nio.NioEventLoopGroup
    import io.netty.channel.socket.nio.NioSocketChannel
    import io.netty.handler.codec.http2._
    val group = new NioEventLoopGroup(1)
    try {
      val done = new java.util.concurrent.CompletableFuture[(Map[String, String], Array[Byte])]()
      val boot = new Bootstrap().group(group).channel(classOf[NioSocketChannel])
        .handler(new ChannelInitializer[io.netty.channel.socket.SocketChannel] {
          override def initChannel(ch: io.netty.channel.socket.SocketChannel): Unit = {
            ch.pipeline().addLast(Http2FrameCodecBuilder.forClient().build())
            ch.pipeline().addLast(new Http2MultiplexHandler(new ChannelInboundHandlerAdapter()))
          }
        })
      val ch = boot.connect("127.0.0.1", port).syncUninterruptibly().channel()
      val sb = new Http2StreamChannelBootstrap(ch)
      sb.handler(new ChannelInitializer[Http2StreamChannel] {
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
                d.release()
                if (d.isEndStream) done.complete((headers, buf.toByteArray))
                ()
              case _ => ()
            }
          })
          ()
        }
      })
      val stream = sb.open().syncUninterruptibly().getNow
      val hdrs = new DefaultHttp2Headers()
      hdrs.method("POST").path(path).scheme("http")
      hdrs.set("content-type", "application/grpc")
      stream.write(new DefaultHttp2HeadersFrame(hdrs, false))
      val framed = new Array[Byte](5 + msg.length)
      framed(0) = 0
      framed(1) = ((msg.length >>> 24) & 0xff).toByte
      framed(2) = ((msg.length >>> 16) & 0xff).toByte
      framed(3) = ((msg.length >>> 8) & 0xff).toByte
      framed(4) = (msg.length & 0xff).toByte
      System.arraycopy(msg, 0, framed, 5, msg.length)
      stream.writeAndFlush(new DefaultHttp2DataFrame(Unpooled.wrappedBuffer(framed), true))
      val out = done.get(15, java.util.concurrent.TimeUnit.SECONDS)
      ch.close().syncUninterruptibly()
      out
    } finally {
      group.shutdownGracefully(0, 1, java.util.concurrent.TimeUnit.SECONDS)
      ()
    }
  }

  test("gRPC serving endpoint: GetOnlineFeaturesV2 over the real HTTP/2 wire") {
    import spark.implicits._
    import graft.serving.FeastProto
    import graft.serving.FeastProto.{EntityRowMsg, OnlineRequestMsg}
    val df = Seq(
      (1L, ts("2024-01-01 10:00:00"), 0.7, "us"),
      (2L, ts("2024-01-02 10:00:00"), 0.9, "de"))
      .toDF("driver_id", "et", "conv_rate", "region")
    val fs = new FeatureStore("grpcsrv", new Registry(), new InMemoryOnlineStore(), spark)
    fs.applyEntity(Entity("driver", GraftType.Int64, Some("driver_id")))
    fs.applyFeatureView(FeatureView("stats", Seq("driver"),
      Seq(Feature("conv_rate", GraftType.Dbl), Feature("region", GraftType.Str)),
      Duration.ZERO, DataFrameSource(df, "et")))
    fs.materialize(Seq("stats"), ts("2024-01-01 00:00:00"), ts("2024-01-03 00:00:00"))
    val server = new graft.serving.GrpcServingServer(fs)
    try {
      // happy path: 2 present drivers + 1 missing, statuses per proto enum
      val reqBytes = FeastProto.encodeOnlineRequest(OnlineRequestMsg(
        features = Seq(("stats", "conv_rate"), ("stats", "region")),
        entityRows = Seq(
          EntityRowMsg(None, Seq("driver_id" -> 1L)),
          EntityRowMsg(None, Seq("driver_id" -> 2L)),
          EntityRowMsg(None, Seq("driver_id" -> 99L))),
        project = None))
      val (headers, body) = grpcCall(server.boundPort,
        "/feast.serving.ServingService/GetOnlineFeaturesV2", reqBytes)
      assert(headers.get(":status").contains("200"), headers)
      assert(headers.get("grpc-status").contains("0"), headers)
      assert(body.length >= 5 && body(0) == 0)
      val len = ((body(1) & 0xff) << 24) | ((body(2) & 0xff) << 16) |
        ((body(3) & 0xff) << 8) | (body(4) & 0xff)
      val rows = FeastProto.decodeOnlineResponse(
        java.util.Arrays.copyOfRange(body, 5, 5 + len))
      assert(rows.length === 3)
      val (v0, s0) = rows(0)
      assert(v0("driver_id") === 1L && v0("stats:conv_rate") === 0.7 &&
        v0("stats:region") === "us")
      assert(s0("stats:conv_rate") === FeastProto.StatusPresent)
      val (v2, s2) = rows(2)
      assert(v2("stats:conv_rate") == null)
      assert(s2("stats:conv_rate") === FeastProto.StatusNotFound &&
        s2("stats:region") === FeastProto.StatusNotFound)

      // serving info method
      val (ih, ibody) = grpcCall(server.boundPort,
        "/feast.serving.ServingService/GetFeastServingInfo", Array.emptyByteArray)
      assert(ih.get("grpc-status").contains("0"))
      assert(new String(ibody, "UTF-8").contains("graft"))

      // unknown method -> grpc-status 12 UNIMPLEMENTED (trailers-only)
      val (uh, _) = grpcCall(server.boundPort,
        "/feast.serving.ServingService/NoSuchMethod", Array.emptyByteArray)
      assert(uh.get("grpc-status").contains("12"), uh)

      // wrong-typed entity key -> grpc-status 3 INVALID_ARGUMENT
      val badReq = FeastProto.encodeOnlineRequest(OnlineRequestMsg(
        features = Seq(("stats", "conv_rate")),
        entityRows = Seq(EntityRowMsg(None, Seq("driver_id" -> "one"))),
        project = None))
      val (bh, _) = grpcCall(server.boundPort,
        "/feast.serving.ServingService/GetOnlineFeaturesV2", badReq)
      assert(bh.get("grpc-status").contains("3"), bh)

      // >64 KB request body: exceeds the HTTP/2 initial flow-control
      // window, so the call only completes if the server replenishes
      // consumed bytes with WINDOW_UPDATE frames (review r7 — without
      // them a compliant client stalls at window 0 forever)
      val bigReq = FeastProto.encodeOnlineRequest(OnlineRequestMsg(
        features = Seq(("stats", "conv_rate")),
        entityRows = (1L to 5000L).map(i =>
          EntityRowMsg(None, Seq("driver_id" -> i))),
        project = None))
      assert(bigReq.length > 70000, s"fixture must exceed the 64KB window, got ${bigReq.length}")
      val (bigH, bigBody) = grpcCall(server.boundPort,
        "/feast.serving.ServingService/GetOnlineFeaturesV2", bigReq)
      assert(bigH.get("grpc-status").contains("0"), bigH)
      val bigLen = ((bigBody(1) & 0xff) << 24) | ((bigBody(2) & 0xff) << 16) |
        ((bigBody(3) & 0xff) << 8) | (bigBody(4) & 0xff)
      val bigRows = FeastProto.decodeOnlineResponse(
        java.util.Arrays.copyOfRange(bigBody, 5, 5 + bigLen))
      assert(bigRows.length === 5000)
      assert(bigRows.head._1("stats:conv_rate") === 0.7)
    } finally {
      server.stop()
      fs.teardown()
    }
  }

  test("GrpcServingClient round-trips against the real server (client.py analog)") {
    import spark.implicits._
    import graft.serving.{FeastProto, GrpcServingClient, GrpcStatusException}
    val df = Seq(
      (1L, ts("2024-01-01 10:00:00"), 0.7, "us"),
      (2L, ts("2024-01-02 10:00:00"), 0.9, "de"))
      .toDF("driver_id", "et", "conv_rate", "region")
    val fs = new FeatureStore("grpccli", new Registry(), new InMemoryOnlineStore(), spark)
    fs.applyEntity(Entity("driver", GraftType.Int64, Some("driver_id")))
    fs.applyFeatureView(FeatureView("stats", Seq("driver"),
      Seq(Feature("conv_rate", GraftType.Dbl), Feature("region", GraftType.Str)),
      Duration.ZERO, DataFrameSource(df, "et")))
    fs.materialize(Seq("stats"), ts("2024-01-01 00:00:00"), ts("2024-01-03 00:00:00"))
    val server = new graft.serving.GrpcServingServer(fs)
    val client = new GrpcServingClient("127.0.0.1", server.boundPort)
    try {
      // two calls on ONE connection (the client multiplexes streams)
      val (version, tpe) = client.servingInfo()
      assert(version.contains("graft") && tpe == 1)

      val rows = client.getOnlineFeatures(
        Seq("stats:conv_rate", "stats:region"),
        Seq(Map[String, Any]("driver_id" -> 1L),
          Map[String, Any]("driver_id" -> 99L)))
      assert(rows.length == 2)
      val (v0, s0) = rows(0)
      assert(v0("driver_id") == 1L && v0("stats:conv_rate") == 0.7 &&
        v0("stats:region") == "us")
      assert(s0("stats:conv_rate") == FeastProto.StatusPresent)
      val (v1, s1) = rows(1)
      assert(v1("stats:conv_rate") == null &&
        s1("stats:conv_rate") == FeastProto.StatusNotFound)

      // big batch exceeding the 64 KB window BOTH ways: exercises the
      // client's response-side WINDOW_UPDATE replenish too
      val big = client.getOnlineFeatures(
        Seq("stats:conv_rate"),
        (1L to 5000L).map(i => Map[String, Any]("driver_id" -> i)))
      assert(big.length == 5000 && big.head._1("stats:conv_rate") == 0.7)

      // overlapping calls multiplex on the one connection (the client's
      // stated thread-safety contract): 8 concurrent lookups, each must
      // get ITS OWN driver's answer back on its own stream
      val pool = java.util.concurrent.Executors.newFixedThreadPool(8)
      try {
        import scala.jdk.CollectionConverters._
        val tasks = (1 to 8).map { i =>
          val id = if (i % 2 == 0) 1L else 2L
          (() => {
            val r = client.getOnlineFeatures(Seq("stats:region"),
              Seq(Map[String, Any]("driver_id" -> id)))
            (id, r.head._1("stats:region"))
          }): java.util.concurrent.Callable[(Long, Any)]
        }
        pool.invokeAll(tasks.asJava).asScala.foreach { f =>
          val (id, region) = f.get(15, java.util.concurrent.TimeUnit.SECONDS)
          assert(region == (if (id == 1L) "us" else "de"),
            s"driver $id got cross-wired answer $region")
        }
      } finally pool.shutdown()

      // server-side INVALID_ARGUMENT surfaces as a typed exception
      val e = intercept[GrpcStatusException] {
        client.getOnlineFeatures(Seq("stats:conv_rate"),
          Seq(Map[String, Any]("driver_id" -> "one")))
      }
      assert(e.status == 3, e.getMessage)
      // the connection survives an errored call
      assert(client.servingInfo()._1.contains("graft"))
    } finally {
      client.close()
      server.stop()
      fs.teardown()
    }
  }

  test("serving JSON stays valid and typed: NaN -> null, bytes -> base64, huge ids -> 400 (review r6)") {
    import spark.implicits._
    val df = Seq(
      (1L, ts("2024-01-01 10:00:00"), Double.NaN, "sig-1".getBytes("UTF-8")),
      (2L, ts("2024-01-02 10:00:00"), 0.5, "sig-2".getBytes("UTF-8")))
      .toDF("driver_id", "et", "score", "sig")
    val fs = new FeatureStore("srv2", new Registry(), new InMemoryOnlineStore(), spark)
    fs.applyEntity(Entity("driver", GraftType.Int64, Some("driver_id")))
    fs.applyFeatureView(FeatureView("sx", Seq("driver"),
      Seq(Feature("score", GraftType.Dbl), Feature("sig", GraftType.Bytes)),
      Duration.ZERO, DataFrameSource(df, "et")))
    fs.materialize(Seq("sx"), ts("2024-01-01 00:00:00"), ts("2024-01-03 00:00:00"))
    val server = new ServingServer(fs).start()
    val base = s"http://localhost:${server.boundPort}"
    val client = HttpClient.newHttpClient()
    try {
      val resp = client.send(
        HttpRequest.newBuilder(URI.create(s"$base/get-online-features"))
          .POST(HttpRequest.BodyPublishers.ofString(
            """{"features": ["sx:score", "sx:sig"],
              |"entity_rows": [{"driver_id": 1}, {"driver_id": 2}]}""".stripMargin))
          .build(),
        HttpResponse.BodyHandlers.ofString())
      assert(resp.statusCode() == 200, resp.body())
      // the body must PARSE — a bare NaN token is not JSON
      val o = Json.parse(resp.body()).asInstanceOf[JObj]
      val scores = (o("field_values").asInstanceOf[JObj]("sx:score"): @unchecked) match {
        case JArr(xs) => xs
      }
      assert(scores == Vector(JNull, JNum(0.5)))
      val sigs = (o("field_values").asInstanceOf[JObj]("sx:sig"): @unchecked) match {
        case JArr(xs) => xs.map(_.asInstanceOf[JStr].v)
      }
      assert(sigs.map(s => new String(java.util.Base64.getDecoder.decode(s), "UTF-8"))
        == Vector("sig-1", "sig-2"))

      // a whole double beyond int64 is an invalid id, not Long.MaxValue
      val huge = client.send(
        HttpRequest.newBuilder(URI.create(s"$base/get-online-features"))
          .POST(HttpRequest.BodyPublishers.ofString(
            """{"features": ["sx:score"], "entity_rows": [{"driver_id": 1e19}]}"""))
          .build(),
        HttpResponse.BodyHandlers.ofString())
      assert(huge.statusCode() == 400 && huge.body().contains("int64"))
      // the off-by-one at the TOP of the range (review r12):
      // Long.MaxValue.toDouble rounds UP to 2^63, so 9223372036854775808
      // previously slipped the strict > check and saturated to
      // Long.MaxValue, probing a fabricated key
      val boundary = client.send(
        HttpRequest.newBuilder(URI.create(s"$base/get-online-features"))
          .POST(HttpRequest.BodyPublishers.ofString(
            """{"features": ["sx:score"], "entity_rows": [{"driver_id": 9223372036854775808.0}]}"""))
          .build(),
        HttpResponse.BodyHandlers.ofString())
      assert(boundary.statusCode() == 400 && boundary.body().contains("int64"),
        s"2^63 must be rejected: ${boundary.statusCode()} ${boundary.body().take(120)}")
    } finally {
      server.stop()
      fs.teardown()
    }
  }

  test("gRPC hardening: oversized request RESOURCE_EXHAUSTED; dead server fails fast (review r12)") {
    import spark.implicits._
    val df = Seq((1L, ts("2024-01-01 10:00:00"), 2.0)).toDF("driver_id", "et", "v")
    val fs = new FeatureStore("srv_g12", new Registry(), new InMemoryOnlineStore(), spark)
    fs.applyEntity(Entity("driver", GraftType.Int64, Some("driver_id")))
    fs.applyFeatureView(FeatureView("gv", Seq("driver"),
      Seq(Feature("v", GraftType.Dbl)), Duration.ZERO, DataFrameSource(df, "et")))
    fs.materialize(Seq("gv"), ts("2024-01-01 00:00:00"), ts("2024-01-02 00:00:00"))
    val server = new graft.serving.GrpcServingServer(fs)
    val client = new graft.serving.GrpcServingClient("localhost", server.boundPort)
    try {
      // a >4 MiB request must answer grpc-status 8 (RESOURCE_EXHAUSTED),
      // never buffer without bound: 5 MiB of entity rows
      val bigRows = (0 until 120000).map(i =>
        graft.serving.FeastProto.EntityRowMsg(Some(1706745600L),
          Seq("driver_id" -> i.toLong, "pad" -> ("x" * 24))))
      val e = intercept[graft.serving.GrpcStatusException] {
        client.getOnlineFeatures(Seq(("gv", "v")), bigRows, project = Some("srv_g12"))
      }
      assert(e.status == 8, s"expected RESOURCE_EXHAUSTED, got ${e.status}: ${e.getMessage}")
      // a small call still works on the same connection
      val ok = client.getOnlineFeatures(Seq(("gv", "v")),
        Seq(graft.serving.FeastProto.EntityRowMsg(Some(1706745600L),
          Seq("driver_id" -> 1L))), project = Some("srv_g12"))
      assert(ok.nonEmpty && ok.head._1("gv:v") == 2.0)
    } finally client.close()
    // dead server: a call on an ESTABLISHED connection must fail
    // PROMPTLY as a transport status, not block the full 15 s deadline
    // and claim deadline-exceeded. One exchange first: a connection
    // still sitting in the kernel accept backlog at stop() time is
    // never registered with a loop, so nothing closes it — THAT case is
    // what the deadline backstop exists for (observed as a suite-load
    // flake), and it is not the property under test here.
    val port = server.boundPort
    val client2 = new graft.serving.GrpcServingClient("localhost", port)
    assert(client2.servingInfo()._1.nonEmpty)
    server.stop()
    val t0 = System.nanoTime()
    val e2 = intercept[graft.serving.GrpcStatusException] {
      client2.getOnlineFeatures(Seq(("gv", "v")),
        Seq(graft.serving.FeastProto.EntityRowMsg(Some(1706745600L),
          Seq("driver_id" -> 1L))), project = Some("srv_g12"))
    }
    val elapsed = (System.nanoTime() - t0) / 1e9
    assert(e2.status != 4 && elapsed < 10.0,
      s"dead server must fail fast as transport error, got status ${e2.status} after $elapsed s")
    client2.close()
    fs.teardown()
  }

  test("getOnlineFeatures(service) with zero entity rows keeps the derived keys (review r6)") {
    import spark.implicits._
    val df = Seq((1L, ts("2024-01-01 10:00:00"), 2.0)).toDF("driver_id", "et", "v")
    val fs = new FeatureStore("srv3", new Registry(), new InMemoryOnlineStore(), spark)
    fs.applyEntity(Entity("driver", GraftType.Int64, Some("driver_id")))
    fs.applyFeatureView(FeatureView("dv", Seq("driver"),
      Seq(Feature("v", GraftType.Dbl)), Duration.ZERO, DataFrameSource(df, "et")))
    fs.registry.applyFeatureService(FeatureService("svc",
      Seq(FeatureViewProjection("dv", Seq("v"))),
      derived = Seq(DerivedFeature("v2", "v * 2"))))
    fs.materialize(Seq("dv"), ts("2024-01-01 00:00:00"), ts("2024-01-02 00:00:00"))
    val resp = fs.getOnlineFeatures(fs.registry.getFeatureService("svc"), Seq.empty)
    assert(resp.toMap.contains("v2") && resp.toMap("v2").isEmpty,
      "derived key present with empty values")
    fs.teardown()
  }

  test("serving latency SLO: warm point reads stay in single-digit-ms p50 on both transports") {
    // The regression floor behind the tools/ServingSlo table in
    // BENCH_NOTES (r9 verdict ask #5): one client, warm decoded-bucket
    // cache, durable bucketed-parquet store — the production serving
    // shape. p50 < 10 ms catches the two real failure classes: a
    // transport stall re-entering the wire path (the ~40 ms
    // Nagle/delayed-ACK interlock sun.net.httpserver.nodelay exists to
    // prevent — measured p50 44 ms without it, ~2-4 ms with) and a
    // store regression that starts launching Spark jobs per read
    // (~100 ms+). p99 is capped loosely (60 ms) because a shared CI
    // box owes occasional multi-ms scheduler stalls no engine change
    // can control for.
    import spark.implicits._
    val tmp = s"/tmp/graft_slo_spec_${java.util.UUID.randomUUID().toString.take(8)}"
    val df = (0L until 100L)
      .map(i => (i, ts("2024-01-01 10:00:00"), i.toDouble, s"t$i"))
      .toDF("user_id", "et", "value", "tag")
    val store = new graft.online.ParquetOnlineStore(s"$tmp/store", numBuckets = 8)
    val fs = new FeatureStore("slo_spec", new Registry(), store, spark)
    fs.applyEntity(Entity("user", GraftType.Int64, joinKeyOpt = Some("user_id")))
    fs.applyFeatureView(FeatureView("feats", Seq("user"),
      Seq(Feature("value", GraftType.Dbl), Feature("tag", GraftType.Str)),
      Duration.ZERO, DataFrameSource(df, "et")))
    fs.materialize(Seq("feats"), ts("2024-01-01 00:00:00"), ts("2024-01-02 00:00:00"))

    val http = new ServingServer(fs).start()
    val grpc = new graft.serving.GrpcServingServer(fs)
    val httpClient = HttpClient.newHttpClient()
    val grpcClient = new graft.serving.GrpcServingClient("127.0.0.1", grpc.boundPort)
    val uri = URI.create(s"http://127.0.0.1:${http.boundPort}/get-online-features")
    def httpOnce(id: Long): Unit = {
      val resp = httpClient.send(HttpRequest.newBuilder(uri)
          .POST(HttpRequest.BodyPublishers.ofString(
            s"""{"features":["feats:value"],"entity_rows":[{"user_id":$id}]}"""))
          .build(),
        HttpResponse.BodyHandlers.ofString())
      assert(resp.statusCode() == 200, resp.body())
    }
    def grpcOnce(id: Long): Unit = {
      grpcClient.getOnlineFeatures(Seq("feats:value"), Seq(Map("user_id" -> id)))
      ()
    }
    def percentiles(call: Long => Unit): (Double, Double) = {
      (0 until 100).foreach(i => call(i.toLong % 100)) // warm: JIT + bucket cache
      val lats = (0 until 200).map { i =>
        val t0 = System.nanoTime()
        call(i.toLong % 100)
        System.nanoTime() - t0
      }.sorted
      (lats(100) / 1e6, lats(198) / 1e6)
    }
    try {
      val (hp50, hp99) = percentiles(httpOnce)
      val (gp50, gp99) = percentiles(grpcOnce)
      assert(hp50 < 10.0, f"HTTP warm p50 $hp50%.2f ms >= 10 ms (Nagle regression?)")
      assert(gp50 < 10.0, f"gRPC warm p50 $gp50%.2f ms >= 10 ms")
      assert(hp99 < 60.0, f"HTTP warm p99 $hp99%.2f ms >= 60 ms")
      assert(gp99 < 60.0, f"gRPC warm p99 $gp99%.2f ms >= 60 ms")
    } finally {
      grpcClient.close(); grpc.stop(); http.stop(); fs.teardown()
      graft.queries.TmpSweeper.register(tmp)
    }
  }
}
