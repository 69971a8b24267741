package graft.online

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native bucket routing for the parquet online store: hash the
  * canonical entity-key serialization ([[EntityKeyCodec]] — sorted key
  * names, tag + LE length prefix + LE value) straight off the
  * InternalRow and take it mod the bucket count.
  *
  * Replaces a Scala UDF over a struct of the key columns: the UDF paid
  * a Catalyst->external Row conversion, per-row tuple allocation, and a
  * re-sort of the key names for EVERY input row — on the store write
  * path that meant boxing the full micro-batch before it ever reached
  * the shuffle. Here the name-block prefix is serialized once at plan
  * time and each row appends only its value bytes.
  *
  * MUST stay the exact twin of the driver-side
  * [[EntityKeyCodec.hashKey]] % buckets (point reads route with that) —
  * pinned by PureSpec against random key values.
  */
case class EntityBucketId(
    children: Seq[Expression],
    keyNames: Seq[String],
    buckets: Int) extends Expression with CodegenFallback {
  require(children.length == keyNames.length,
    "one child expression per join key")
  require(keyNames == keyNames.sorted,
    "builder must pass keys pre-sorted by name (EntityKeyCodec order)")

  override def nullable: Boolean = false
  override def dataType: DataType = IntegerType
  override def prettyName: String = "entity_bucket_id"

  // name block is row-invariant: serialize once, via the codec's ONE
  // layout definition (EntityKeyCodec write* helpers — no second copy
  // of the tag bytes / LE encodings here)
  private lazy val namePrefix: Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    EntityKeyCodec.writeNameBlock(out, keyNames)
    out.toByteArray
  }

  override def eval(input: InternalRow): Any =
    (EntityKeyCodec.murmur3Seed0(CanonicalKeyEval.bytes(
      children, keyNames, namePrefix, input, "bucket routing")) % buckets).toInt

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(children = newChildren)
}

/** The ONE per-row canonical-serialization walk shared by
  * [[EntityBucketId]] and [[EntityKeyHex]] — both are spec-pinned
  * byte-for-byte twins of [[EntityKeyCodec.serialize]], and a codec
  * change (new key type, altered tags) must have exactly one
  * expression-side site to update or routing agreement breaks
  * (review r14). */
private[online] object CanonicalKeyEval {
  def bytes(children: Seq[Expression], keyNames: Seq[String],
      namePrefix: Array[Byte], input: InternalRow, purpose: String): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(namePrefix.length + 16 * children.length)
    out.write(namePrefix, 0, namePrefix.length)
    var i = 0
    while (i < children.length) {
      val c = children(i)
      val v = c.eval(input)
      if (v == null) throw new IllegalArgumentException(
        s"null entity key '${keyNames(i)}' reached $purpose " +
          "(guardNullKeys should reject these upstream)")
      c.dataType match {
        case StringType =>
          EntityKeyCodec.writeTaggedString(out, v.asInstanceOf[UTF8String].getBytes)
        case BinaryType =>
          EntityKeyCodec.writeTaggedBytes(out, v.asInstanceOf[Array[Byte]])
        case IntegerType =>
          EntityKeyCodec.writeTaggedInt32(out, v.asInstanceOf[Int])
        case LongType =>
          EntityKeyCodec.writeTaggedInt64(out, v.asInstanceOf[Long])
        case other => throw new IllegalArgumentException(
          s"unsupported entity key type for '${keyNames(i)}': $other " +
            "(STRING/BYTES/INT32/INT64 only)")
      }
      i += 1
    }
    out.toByteArray
  }
}

/** Hex string of the canonical entity-key serialization — the
  * Spark-side twin of [[EntityKeyCodec.hexKey]], for routing layers
  * that hash the canonical key with something other than murmur3-mod
  * (the sharded store's rendezvous routing feeds this into md5 HRW
  * scores). Shares [[EntityBucketId]]'s serialization discipline:
  * plan-time name block, per-row value bytes, loud null/type errors. */
case class EntityKeyHex(
    children: Seq[Expression],
    keyNames: Seq[String]) extends Expression with CodegenFallback {
  require(children.length == keyNames.length,
    "one child expression per join key")
  require(keyNames == keyNames.sorted,
    "builder must pass keys pre-sorted by name (EntityKeyCodec order)")

  override def nullable: Boolean = false
  override def dataType: DataType = StringType
  override def prettyName: String = "entity_key_hex"

  private lazy val namePrefix: Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    EntityKeyCodec.writeNameBlock(out, keyNames)
    out.toByteArray
  }

  override def eval(input: InternalRow): Any =
    UTF8String.fromString(EntityKeyCodec.toHex(CanonicalKeyEval.bytes(
      children, keyNames, namePrefix, input, "shard routing")))

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(children = newChildren)
}

object EntityBucketExpr {
  import org.apache.spark.sql.graftshim.ColumnShim

  /** bucket id column over `joinKeys` (any order; sorted internally to
    * the canonical serialization order). */
  def bucketId(joinKeys: Seq[String], buckets: Int): Column = {
    val sorted = joinKeys.sorted
    ColumnShim.column(EntityBucketId(
      sorted.map(n => ColumnShim.expression(org.apache.spark.sql.functions.col(n))),
      sorted, buckets))
  }

  /** canonical-serialization hex column over `joinKeys` — must stay
    * the exact twin of [[EntityKeyCodec.hexKey]] (PureSpec-pinned). */
  def keyHex(joinKeys: Seq[String]): Column = {
    val sorted = joinKeys.sorted
    ColumnShim.column(EntityKeyHex(
      sorted.map(n => ColumnShim.expression(org.apache.spark.sql.functions.col(n))),
      sorted))
  }
}
