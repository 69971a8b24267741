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

  // ---- the ONE definition of the canonical byte layout --------------
  // Shared with the native EntityBucketId expression: tag bytes and LE
  // encodings live only here, so the driver-side and expression-side
  // serializers cannot drift (review r6 — two hand-written copies of a
  // layout that "MUST stay exact twins" is how point reads misroute).
  private[online] def writeLe32(out: java.io.ByteArrayOutputStream, v: Int): Unit =
    out.write(ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN).putInt(v).array())
  private[online] def writeLe64(out: java.io.ByteArrayOutputStream, v: Long): Unit =
    out.write(ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN).putLong(v).array())
  /** The row-invariant name block for pre-sorted key names. */
  private[online] def writeNameBlock(
      out: java.io.ByteArrayOutputStream, sortedNames: Seq[String]): Unit =
    sortedNames.foreach { name =>
      val nb = name.getBytes(StandardCharsets.UTF_8)
      writeLe32(out, nb.length); out.write(nb)
    }
  private[online] def writeTaggedString(
      out: java.io.ByteArrayOutputStream, b: Array[Byte]): Unit = {
    out.write(1); writeLe32(out, b.length); out.write(b)
  }
  private[online] def writeTaggedBytes(
      out: java.io.ByteArrayOutputStream, b: Array[Byte]): Unit = {
    out.write(2); writeLe32(out, b.length); out.write(b)
  }
  private[online] def writeTaggedInt32(
      out: java.io.ByteArrayOutputStream, i: Int): Unit = {
    out.write(3); writeLe32(out, 4); writeLe32(out, i)
  }
  private[online] def writeTaggedInt64(
      out: java.io.ByteArrayOutputStream, l: Long): Unit = {
    out.write(4); writeLe32(out, 8); writeLe64(out, l)
  }

  /** Serialize (joinKey -> value) pairs; key order-insensitive. */
  def serialize(keys: Seq[(String, Any)]): Array[Byte] = {
    require(keys.nonEmpty, "entity key must have at least one join key")
    val sorted = keys.sortBy(_._1)
    val out = new java.io.ByteArrayOutputStream()
    writeNameBlock(out, sorted.map(_._1))
    sorted.foreach { case (name, value) =>
      value match {
        case s: String => writeTaggedString(out, s.getBytes(StandardCharsets.UTF_8))
        case b: Array[Byte] => writeTaggedBytes(out, b)
        case i: Int => writeTaggedInt32(out, i)
        case l: Long => writeTaggedInt64(out, l)
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
  def hexKey(keys: Seq[(String, Any)]): String = toHex(serialize(keys))

  /** Lowercase hex — ONE definition shared with the Spark-side
    * [[EntityKeyHex]] expression so routing layers hashing the hex
    * string (sharded HRW) agree byte-for-byte across paths. */
  def toHex(b: Array[Byte]): String = {
    val sb = new StringBuilder(b.length * 2)
    b.foreach(x => sb.append(f"${x & 0xff}%02x"))
    sb.toString
  }

  /** MurmurHash3 x64 128-bit (seed 0) — the reference hashes the
    * serialized entity key with murmur3_128 and uses the hex digest as
    * the DynamoDB/Datastore document id (helpers.py:46-65
    * compute_entity_id). Canonical x64_128 algorithm; returns (h1, h2). */
  def murmur3x64_128(data: Array[Byte], seed: Long = 0L): (Long, Long) = {
    val c1 = 0x87c37b91114253d5L
    val c2 = 0x4cf5ad432745937fL
    var h1 = seed
    var h2 = seed
    val nBlocks = data.length / 16
    val buf = ByteBuffer.wrap(data).order(ByteOrder.LITTLE_ENDIAN)
    var i = 0
    while (i < nBlocks) {
      var k1 = buf.getLong(i * 16)
      var k2 = buf.getLong(i * 16 + 8)
      k1 *= c1; k1 = java.lang.Long.rotateLeft(k1, 31); k1 *= c2; h1 ^= k1
      h1 = java.lang.Long.rotateLeft(h1, 27); h1 += h2; h1 = h1 * 5 + 0x52dce729L
      k2 *= c2; k2 = java.lang.Long.rotateLeft(k2, 33); k2 *= c1; h2 ^= k2
      h2 = java.lang.Long.rotateLeft(h2, 31); h2 += h1; h2 = h2 * 5 + 0x38495ab5L
      i += 1
    }
    // tail
    var k1 = 0L
    var k2 = 0L
    val tail = nBlocks * 16
    val rem = data.length & 15
    def b(j: Int): Long = (data(tail + j) & 0xffL)
    if (rem > 8) {
      var j = rem - 1
      while (j >= 8) { k2 = (k2 << 8) | b(j); j -= 1 }
    }
    if (rem > 0) {
      var j = math.min(rem, 8) - 1
      while (j >= 0) { k1 = (k1 << 8) | b(j); j -= 1 }
    }
    if (rem > 8) { k2 *= c2; k2 = java.lang.Long.rotateLeft(k2, 33); k2 *= c1; h2 ^= k2 }
    if (rem > 0) { k1 *= c1; k1 = java.lang.Long.rotateLeft(k1, 31); k1 *= c2; h1 ^= k1 }
    // finalization
    h1 ^= data.length.toLong; h2 ^= data.length.toLong
    h1 += h2; h2 += h1
    def fmix(kIn: Long): Long = {
      var k = kIn
      k ^= k >>> 33; k *= 0xff51afd7ed558ccdL
      k ^= k >>> 33; k *= 0xc4ceb9fe1a85ec53L
      k ^= k >>> 33; k
    }
    h1 = fmix(h1); h2 = fmix(h2)
    h1 += h2; h2 += h1
    (h1, h2)
  }

  /** Hex form of the 128-bit hash of a serialized entity key — the
    * document-id analog (helpers.py:46-65). */
  def entityId(keys: Seq[(String, Any)]): String = {
    val (h1, h2) = murmur3x64_128(serialize(keys))
    f"$h1%016x$h2%016x"
  }

  // ---- byte-exact reference-codec twins (cross-store compat) --------
  // The graft store's own layout above deliberately simplifies (1-byte
  // tags, length-prefixed names); the functions below instead reproduce
  // the reference's wire bytes EXACTLY, so a deployment can read or
  // write a store populated by the reference. Pinned against
  // hand-computed byte constants in PureSpec.

  /** key_encoding_utils.py:22-48 `serialize_entity_key` (v1 layout):
    * join keys sorted by name; per key `<I`(STRING=2) + utf8 name (no
    * length prefix); per value `<I`(type enum) + `<I`(len) + LE bytes.
    * NOTE: int64 packs as standard-size `<l` — FOUR bytes, silently
    * truncating to 32 bits. That is the reference's own v1 behavior
    * (its later serialization_version=2 switched to 8-byte `<q`); it
    * is reproduced bit-for-bit here because byte compatibility with
    * stores the reference wrote is the entire point of this function.
    * Only STRING / BYTES / INT32 / INT64 key types exist, as in the
    * reference. */
  def referenceSerializeEntityKey(keys: Seq[(String, Any)]): Array[Byte] = {
    require(keys.nonEmpty, "entity key must have at least one join key")
    val sorted = keys.sortBy(_._1)
    val out = new java.io.ByteArrayOutputStream()
    sorted.foreach { case (name, _) =>
      writeLe32(out, 2) // ValueType.STRING tags every join-key NAME
      out.write(name.getBytes(StandardCharsets.UTF_8))
    }
    sorted.foreach { case (name, value) =>
      value match {
        case s: String =>
          val b = s.getBytes(StandardCharsets.UTF_8)
          writeLe32(out, 2); writeLe32(out, b.length); out.write(b)
        case b: Array[Byte] =>
          writeLe32(out, 1); writeLe32(out, b.length); out.write(b)
        case i: Int =>
          writeLe32(out, 3); writeLe32(out, 4); writeLe32(out, i)
        case l: Long =>
          writeLe32(out, 4); writeLe32(out, 4); writeLe32(out, l.toInt)
        case other => throw new IllegalArgumentException(
          s"unsupported entity key type for '$name': " +
          s"${if (other == null) "null" else other.getClass.getName} " +
          "(STRING/BYTES/INT32/INT64 only)")
      }
    }
    out.toByteArray
  }

  /** helpers.py:49-56 `_mmh3`: the Redis HASH field name for one
    * feature — murmur3_32 seed-0 of "view:feature", as its 4
    * little-endian bytes. */
  def referenceFeatureFieldName(view: String, feature: String): Array[Byte] = {
    val h = murmur3Seed0(s"$view:$feature".getBytes(StandardCharsets.UTF_8))
    Array[Byte](h.toByte, (h >>> 8).toByte, (h >>> 16).toByte, (h >>> 24).toByte)
  }

  /** helpers.py:59-65 `compute_entity_id` — the document id the
    * reference's DynamoDB/Datastore stores key items by: the raw
    * 16-byte murmur3 x64_128 digest of the v1-serialized entity key,
    * hex-encoded. `mmh3.hash_bytes` emits the digest as h1 then h2,
    * each LITTLE-endian (the canonical C MurmurHash3_x64_128 output
    * order) — not the big-endian rendering [[entityId]] uses for the
    * graft-native id. Pinned against an independent Python replay in
    * PureSpec. */
  def referenceEntityId(keys: Seq[(String, Any)]): String = {
    val (h1, h2) = murmur3x64_128(referenceSerializeEntityKey(keys))
    val sb = new StringBuilder(32)
    Seq(h1, h2).foreach { h =>
      var i = 0
      while (i < 8) { sb.append(f"${(h >>> (8 * i)) & 0xff}%02x"); i += 1 }
    }
    sb.toString
  }

  /** helpers.py:40-46 `_redis_key`: the Redis key is the protobuf wire
    * encoding of RedisKey(project=1, entity_names=2, entity_values=3)
    * with values as feast.types.Value oneof fields (bytes_val=1,
    * string_val=2, int32_val=3, int64_val=4), names/values in the
    * caller's order (NOT sorted — only serialize_entity_key sorts).
    * Python protobuf serializes fields in field-number order, which
    * this writer reproduces. */
  def referenceRedisKey(project: String, keys: Seq[(String, Any)]): Array[Byte] = {
    // ONE varint encoder for both the outer message and the nested
    // Value messages — byte-exactness is this function's whole job, so
    // the encoding must not exist twice (negative ints arrive
    // sign-extended to 64 bits → ten bytes, the protobuf contract)
    def varint(o: java.io.ByteArrayOutputStream, v0: Long): Unit = {
      var v = v0
      while ((v & ~0x7fL) != 0L) { o.write(((v & 0x7f) | 0x80).toInt); v >>>= 7 }
      o.write(v.toInt)
    }
    def lenField(o: java.io.ByteArrayOutputStream, fieldNo: Int,
        payload: Array[Byte]): Unit = {
      varint(o, (fieldNo << 3) | 2); varint(o, payload.length.toLong); o.write(payload)
    }
    def valueMsg(name: String, value: Any): Array[Byte] = {
      val m = new java.io.ByteArrayOutputStream()
      value match {
        case b: Array[Byte] => lenField(m, 1, b)
        case s: String => lenField(m, 2, s.getBytes(StandardCharsets.UTF_8))
        case i: Int => varint(m, (3 << 3) | 0); varint(m, i.toLong)
        case l: Long => varint(m, (4 << 3) | 0); varint(m, l)
        case other => throw new IllegalArgumentException(
          s"unsupported entity key type for '$name': " +
          s"${if (other == null) "null" else other.getClass.getName}")
      }
      m.toByteArray
    }
    val out = new java.io.ByteArrayOutputStream()
    lenField(out, 1, project.getBytes(StandardCharsets.UTF_8))
    keys.foreach { case (n, _) => lenField(out, 2, n.getBytes(StandardCharsets.UTF_8)) }
    keys.foreach { case (n, v) => lenField(out, 3, valueMsg(n, v)) }
    out.toByteArray
  }
}
