package graft.online

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets

import scala.util.hashing.MurmurHash3

/** Canonical entity-key serialization + hashing (O11/O12).
  *
  * Reference semantics (feast/infra/key_encoding_utils.py:9-48): join
  * keys sorted by name, then a type-tagged, length-prefixed,
  * little-endian byte layout that is stable across versions; only
  * STRING / BYTES / INT32 / INT64 key types are supported. We keep the
  * same structure (sorted keys, tag + length prefix + LE values) so keys
  * are stable and collision-free, without chasing byte-for-byte parity
  * with the proto enum values.
  *
  * Hashing (reference helpers.py:40-65): murmur3_32 with seed 0 — note
  * Spark's builtin `hash()` is murmur3_32 with seed 42, so a store that
  * needs reference-compatible hashes must not use it.
  */
object EntityKeyCodec {

  private val TagString: Byte = 1
  private val TagBytes: Byte = 2
  private val TagInt32: Byte = 3
  private val TagInt64: Byte = 4

  /** Serialize (joinKey -> value) pairs; key order-insensitive. */
  def serialize(keys: Seq[(String, Any)]): Array[Byte] = {
    require(keys.nonEmpty, "entity key must have at least one join key")
    val sorted = keys.sortBy(_._1)
    val out = new java.io.ByteArrayOutputStream()
    def writeLe32(v: Int): Unit =
      out.write(ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN).putInt(v).array())
    def writeLe64(v: Long): Unit =
      out.write(ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN).putLong(v).array())
    sorted.foreach { case (name, _) =>
      val nb = name.getBytes(StandardCharsets.UTF_8)
      writeLe32(nb.length); out.write(nb)
    }
    sorted.foreach { case (name, value) =>
      value match {
        case s: String =>
          val b = s.getBytes(StandardCharsets.UTF_8)
          out.write(TagString.toInt); writeLe32(b.length); out.write(b)
        case b: Array[Byte] =>
          out.write(TagBytes.toInt); writeLe32(b.length); out.write(b)
        case i: Int => out.write(TagInt32.toInt); writeLe32(4); writeLe32(i)
        case l: Long => out.write(TagInt64.toInt); writeLe32(8); writeLe64(l)
        case other => throw new IllegalArgumentException(
          s"unsupported entity key type for '$name': " +
          s"${if (other == null) "null" else other.getClass.getName} " +
          "(STRING/BYTES/INT32/INT64 only)")
      }
    }
    out.toByteArray
  }

  /** murmur3_32, seed 0 (reference mmh3.hash(key, signed=False)),
    * rendered unsigned. */
  def murmur3Seed0(bytes: Array[Byte]): Long =
    MurmurHash3.bytesHash(bytes, 0).toLong & 0xffffffffL

  def hashKey(keys: Seq[(String, Any)]): Long = murmur3Seed0(serialize(keys))

  /** Hex digest used as a compact store key. */
  def hexKey(keys: Seq[(String, Any)]): String = {
    val b = serialize(keys)
    val sb = new StringBuilder(b.length * 2)
    b.foreach(x => sb.append(f"${x & 0xff}%02x"))
    sb.toString
  }
}
