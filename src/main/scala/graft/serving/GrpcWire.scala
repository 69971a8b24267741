package graft.serving

/** gRPC PROTOCOL-HTTP2 helpers shared by [[GrpcServingServer]] and
  * [[GrpcServingClient]]: the 5-byte message framing
  * (`[compressed flag][length BE][payload]`) and the `grpc-message`
  * percent encoding. Single source so the two endpoints cannot drift.
  */
private[serving] object GrpcWire {

  /** `[flag][len BE][payload]` -> payload (unary: exactly one message;
    * compression unsupported, as advertised by never sending
    * grpc-encoding). */
  def unframe(bytes: Array[Byte]): Array[Byte] = {
    require(bytes.length >= 5, s"gRPC frame too short: ${bytes.length} bytes")
    require(bytes(0) == 0, "compressed gRPC frames are not supported")
    val len = ((bytes(1) & 0xff) << 24) | ((bytes(2) & 0xff) << 16) |
      ((bytes(3) & 0xff) << 8) | (bytes(4) & 0xff)
    // strict ==: trailing bytes would mean a second message in a unary
    // call — reject instead of silently answering from the first
    require(len >= 0 && bytes.length == 5 + len,
      s"unary gRPC call carried ${bytes.length - 5} body bytes, frame declares $len")
    java.util.Arrays.copyOfRange(bytes, 5, 5 + len)
  }

  def frame(payload: Array[Byte]): Array[Byte] = {
    val out = new Array[Byte](5 + payload.length)
    out(0) = 0
    out(1) = ((payload.length >>> 24) & 0xff).toByte
    out(2) = ((payload.length >>> 16) & 0xff).toByte
    out(3) = ((payload.length >>> 8) & 0xff).toByte
    out(4) = (payload.length & 0xff).toByte
    System.arraycopy(payload, 0, out, 5, payload.length)
    out
  }

  /** gRPC PROTOCOL-HTTP2 grpc-message encoding: percent-encode %XX for
    * bytes outside 0x20–0x7E and for '%' itself; printable ASCII
    * (INCLUDING space) stays raw. URLEncoder is wrong here — its '+'
    * for space is never decoded by gRPC clients (review r7). */
  def messageEncode(s: String): String = {
    val sb = new StringBuilder
    s.getBytes(java.nio.charset.StandardCharsets.UTF_8).foreach { b =>
      val u = b & 0xff
      if (u >= 0x20 && u <= 0x7e && u != '%') sb.append(u.toChar)
      else sb.append(f"%%$u%02X")
    }
    sb.toString
  }

  /** Inverse of [[messageEncode]]; tolerant of malformed escapes (the
    * spec tells clients to pass unknown sequences through). */
  def messageDecode(s: String): String = {
    val out = new java.io.ByteArrayOutputStream()
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      def hex(ch: Char): Boolean =
        (ch >= '0' && ch <= '9') || (ch >= 'a' && ch <= 'f') || (ch >= 'A' && ch <= 'F')
      // STRICT two-hex-digit escapes only: parseInt(_, 16) accepts
      // '+'/'-' signs, so "%-1" decoded to byte 0xFF (invalid UTF-8)
      // instead of passing through verbatim as the spec requires for
      // unknown sequences (review r12)
      if (c == '%' && i + 2 < s.length && hex(s.charAt(i + 1)) && hex(s.charAt(i + 2))) {
        out.write(Integer.parseInt(s.substring(i + 1, i + 3), 16))
        i += 3
      } else { out.write(c.toInt); i += 1 }
    }
    new String(out.toByteArray, java.nio.charset.StandardCharsets.UTF_8)
  }
}
