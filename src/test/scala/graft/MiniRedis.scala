package graft

import java.io.{BufferedInputStream, BufferedOutputStream, InputStream, OutputStream}
import java.net.{ServerSocket, Socket}
import java.nio.charset.StandardCharsets.{ISO_8859_1, UTF_8}
import java.util.concurrent.ConcurrentHashMap

import scala.jdk.CollectionConverters._

/** In-process RESP2 server for testing [[graft.online.RedisOnlineStore]]
  * without a real Redis (the env has no broker/server binaries): a
  * ConcurrentHashMap of hashes behind the exact wire protocol the
  * client speaks. Supports HSET / HGET / HDEL / HGETALL / DEL / SCAN / PING —
  * the store's full command surface. Binary-safe values; keys and
  * fields are mapped through ISO-8859-1 (bijective byte<->char, so
  * BINARY keys/fields — e.g. the reference layout's protobuf RedisKey
  * and mmh3 field names — never collide through UTF-8 replacement
  * chars). SCAN is single-shot (returns cursor 0 with every match) —
  * the cursor contract's degenerate but valid form. Test scope only.
  */
final class MiniRedis {
  private val data = new ConcurrentHashMap[String, ConcurrentHashMap[String, Array[Byte]]]()
  private val server = new ServerSocket(0)
  @volatile private var running = true
  val port: Int = server.getLocalPort

  private val acceptor = new Thread(() => {
    while (running) {
      try {
        val s = server.accept()
        val t = new Thread(() => try serve(s) catch { case _: Throwable => () })
        t.setDaemon(true)
        t.start()
      } catch { case _: Throwable => () } // closed
    }
  })
  acceptor.setDaemon(true)
  acceptor.start()

  def stop(): Unit = { running = false; server.close() }

  def keyCount: Int = data.size

  private def readLine(in: InputStream): String = {
    val sb = new StringBuilder
    var c = in.read()
    while (c != '\r' && c >= 0) { sb.append(c.toChar); c = in.read() }
    in.read() // \n
    sb.toString
  }

  private def readCommand(in: InputStream): Option[Vector[Array[Byte]]] = {
    val t = in.read()
    if (t < 0) return None
    require(t.toChar == '*', s"expected array, got '${t.toChar}'")
    val n = readLine(in).toInt
    Some(Vector.fill(n) {
      require(in.read().toChar == '$', "expected bulk string")
      val len = readLine(in).toInt
      val b = new Array[Byte](len)
      var off = 0
      while (off < len) {
        val r = in.read(b, off, len - off)
        require(r >= 0, "eof mid-bulk"); off += r
      }
      in.read(); in.read() // \r\n
      b
    })
  }

  private def bulk(out: OutputStream, b: Array[Byte]): Unit =
    if (b == null) out.write("$-1\r\n".getBytes(UTF_8))
    else {
      out.write(s"$$${b.length}\r\n".getBytes(UTF_8))
      out.write(b); out.write("\r\n".getBytes(UTF_8))
    }

  private def serve(socket: Socket): Unit = {
    val in = new BufferedInputStream(socket.getInputStream)
    val out = new BufferedOutputStream(socket.getOutputStream)
    var go = true
    while (go) readCommand(in) match {
      case None => go = false; socket.close()
      case Some(args) =>
        val cmd = new String(args(0), UTF_8).toUpperCase
        cmd match {
          case "PING" => out.write("+PONG\r\n".getBytes(UTF_8))
          case "HSET" =>
            val k = new String(args(1), ISO_8859_1)
            val h = data.computeIfAbsent(k, _ => new ConcurrentHashMap())
            var added = 0L
            args.drop(2).grouped(2).foreach { case Seq(f, v) =>
              if (h.put(new String(f, ISO_8859_1), v) == null) added += 1
            }
            out.write(s":$added\r\n".getBytes(UTF_8))
          case "HGET" =>
            val h = data.get(new String(args(1), ISO_8859_1))
            bulk(out, if (h == null) null else h.get(new String(args(2), ISO_8859_1)))
          case "HGETALL" =>
            val h = data.get(new String(args(1), ISO_8859_1))
            if (h == null) out.write("*0\r\n".getBytes(UTF_8))
            else {
              val entries = h.asScala.toVector
              out.write(s"*${entries.size * 2}\r\n".getBytes(UTF_8))
              entries.foreach { case (f, v) =>
                bulk(out, f.getBytes(ISO_8859_1)); bulk(out, v)
              }
            }
          case "HDEL" =>
            val k = new String(args(1), ISO_8859_1)
            val h = data.get(k)
            var n = 0L
            if (h != null) {
              args.drop(2).foreach { f =>
                if (h.remove(new String(f, ISO_8859_1)) != null) n += 1
              }
              // real Redis removes a hash key when its last field goes
              if (h.isEmpty) data.remove(k)
            }
            out.write(s":$n\r\n".getBytes(UTF_8))
          case "DEL" =>
            var n = 0L
            args.drop(1).foreach { k =>
              if (data.remove(new String(k, ISO_8859_1)) != null) n += 1
            }
            out.write(s":$n\r\n".getBytes(UTF_8))
          case "SCAN" =>
            // args: cursor [MATCH pattern] [COUNT n] — single-shot
            val pat = args.sliding(2).collectFirst {
              case Seq(a, b) if new String(a, UTF_8).equalsIgnoreCase("MATCH") =>
                new String(b, UTF_8)
            }
            val rx = pat.map(p =>
              ("\\Q" + p.replace("*", "\\E.*\\Q") + "\\E").r)
            val ks = data.keySet.asScala.toVector
              .filter(k => rx.forall(_.matches(k)))
            out.write("*2\r\n".getBytes(UTF_8))
            bulk(out, "0".getBytes(UTF_8))
            out.write(s"*${ks.size}\r\n".getBytes(UTF_8))
            ks.foreach(k => bulk(out, k.getBytes(ISO_8859_1)))
          case other =>
            out.write(s"-ERR unknown command '$other'\r\n".getBytes(UTF_8))
        }
        out.flush()
    }
  }
}
