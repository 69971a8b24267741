package graft.serving

/** Minimal protobuf (proto3) wire codec — hand-rolled because this
  * environment ships no protobuf-java runtime or protoc. The wire
  * format is public and stable (protobuf.dev/programming-guides/
  * encoding): messages are sequences of `tag = (field << 3) | wire
  * type` followed by a varint (0), fixed 64-bit LE (1),
  * length-delimited bytes (2), or fixed 32-bit LE (5). This is the
  * byte layer under [[FeastProto]]'s message codecs; it implements
  * exactly the subset the feast serving protos need (varint, fixed32/
  * 64, length-delimited, packed repeated numerics via concatenation).
  *
  * proto3 convention: default-valued scalar fields are NOT written
  * (callers skip them); unknown fields are skipped on read, as the
  * spec requires for forward compatibility.
  */
object ProtoWire {

  val WtVarint = 0
  val WtI64 = 1
  val WtLen = 2
  val WtI32 = 5

  final class Writer {
    private val out = new java.io.ByteArrayOutputStream()

    def toBytes: Array[Byte] = out.toByteArray
    def size: Int = out.size()

    /** Unsigned LEB128; negative longs sign-extend to ten bytes, the
      * protobuf contract for int32/int64. */
    def varintRaw(v0: Long): Unit = {
      var v = v0
      while ((v & ~0x7fL) != 0L) { out.write(((v & 0x7f) | 0x80).toInt); v >>>= 7 }
      out.write(v.toInt)
    }
    private def tag(field: Int, wt: Int): Unit = varintRaw((field.toLong << 3) | wt)

    def varintField(field: Int, v: Long): Unit = { tag(field, WtVarint); varintRaw(v) }
    def boolField(field: Int, v: Boolean): Unit = varintField(field, if (v) 1L else 0L)
    def doubleField(field: Int, v: Double): Unit = {
      tag(field, WtI64)
      val bits = java.lang.Double.doubleToRawLongBits(v)
      var i = 0
      while (i < 8) { out.write(((bits >>> (8 * i)) & 0xff).toInt); i += 1 }
    }
    def floatField(field: Int, v: Float): Unit = {
      tag(field, WtI32)
      val bits = java.lang.Float.floatToRawIntBits(v)
      var i = 0
      while (i < 4) { out.write(((bits >>> (8 * i)) & 0xff).toInt); i += 1 }
    }
    def bytesField(field: Int, b: Array[Byte]): Unit = {
      tag(field, WtLen); varintRaw(b.length.toLong); out.write(b)
    }
    def stringField(field: Int, s: String): Unit =
      bytesField(field, s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    /** Nested message / packed payload. */
    def msgField(field: Int, body: Writer): Unit = bytesField(field, body.toBytes)
  }

  /** Pull reader over one message's bytes. */
  final class Reader(bytes: Array[Byte], from: Int, to: Int) {
    def this(bytes: Array[Byte]) = this(bytes, 0, bytes.length)
    private var pos = from

    def hasNext: Boolean = pos < to

    def readVarint(): Long = {
      var shift = 0
      var acc = 0L
      var b = 0
      do {
        require(pos < to, "proto: truncated varint")
        b = bytes(pos); pos += 1
        acc |= (b & 0x7fL) << shift
        shift += 7
        require(shift <= 70, "proto: varint too long")
      } while ((b & 0x80) != 0)
      acc
    }

    /** @return (fieldNumber, wireType) */
    def readTag(): (Int, Int) = {
      val t = readVarint()
      ((t >>> 3).toInt, (t & 7).toInt)
    }

    def readI64(): Long = {
      require(pos + 8 <= to, "proto: truncated fixed64")
      var acc = 0L
      var i = 0
      while (i < 8) { acc |= (bytes(pos + i) & 0xffL) << (8 * i); i += 1 }
      pos += 8; acc
    }

    def readI32(): Int = {
      require(pos + 4 <= to, "proto: truncated fixed32")
      var acc = 0
      var i = 0
      while (i < 4) { acc |= (bytes(pos + i) & 0xff) << (8 * i); i += 1 }
      pos += 4; acc
    }

    /** Length-delimited payload as a sub-reader (no copy). The bound
      * check is `len <= to - pos` (never `pos + len <= to`): a hostile
      * length varint near Int.MaxValue overflows the sum negative and
      * would pass the naive check, silently truncating the message
      * (review r7). */
    def readLenReader(): Reader = {
      val len = readVarint().toInt
      require(len >= 0 && len <= to - pos, "proto: truncated length-delimited field")
      val r = new Reader(bytes, pos, pos + len)
      pos += len; r
    }

    def readLenBytes(): Array[Byte] = {
      val len = readVarint().toInt
      require(len >= 0 && len <= to - pos, "proto: truncated length-delimited field")
      val b = java.util.Arrays.copyOfRange(bytes, pos, pos + len)
      pos += len; b
    }

    def readString(): String =
      new String(readLenBytes(), java.nio.charset.StandardCharsets.UTF_8)

    def skip(wt: Int): Unit = wt match {
      case WtVarint => readVarint(); ()
      case WtI64 => readI64(); ()
      case WtLen => readLenBytes(); ()
      case WtI32 => readI32(); ()
      case other => throw new IllegalArgumentException(s"proto: unsupported wire type $other")
    }
  }
}
