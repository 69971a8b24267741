package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** `bounded_collect(v, cap)`: `collect_list` with a hard per-group
  * STATE bound — the group's values as an array when the group holds at
  * most `cap` values, NULL once it exceeds `cap`.
  *
  * Why: the LSH candidate paths cap degenerate buckets (a band value
  * shared by a giant slice of the corpus — boilerplate floods) by
  * dropping buckets above `maxBucketSize`. Expressing that as
  * `collect_list(...)` then `filter(size(...) <= cap)` caps the pair
  * OUTPUT but not the aggregation STATE: the buffer materializes the
  * full bucket (map-side partials merge to the complete list on the
  * reducer) before the filter drops it — 10⁸ ids in one bucket is an
  * ~800 MB array in a single task. This aggregate stops accumulating
  * the moment a group passes `cap`: the buffer flips to a 1-bit
  * overflow state, drops its contents, and absorbs all further input
  * and merges for free. Map-side partial aggregation applies
  * (TypedImperativeAggregate → ObjectHashAggregate), so the shuffle
  * carries at most `cap` values (or the flag) per (group, map task).
  *
  * Value order in the result is input-encounter order per partial,
  * merge-order across partials — i.e. as unspecified as
  * `collect_list`'s; callers sort (all current sites `array_sort`
  * before pairing). NULL input values are ignored, as in every Spark
  * collect aggregate. NULL result ⇔ the group overflowed `cap`.
  */
case class BoundedCollect(
    child: Expression,
    cap: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[BoundedCollect.Buf] {

  require(cap > 0, s"cap must be positive, got $cap")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(child.dataType, containsNull = false)
  override def prettyName: String = "bounded_collect"

  // any concrete type round-trips the partial->final hand-off as a
  // single-field UnsafeRow; only an untyped NULL child has no encoding
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != NullType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "bounded_collect requires a typed child, got NULL")

  @transient private lazy val valueProj: UnsafeProjection =
    UnsafeProjection.create(Array(child.dataType))

  override def createAggregationBuffer(): BoundedCollect.Buf =
    new BoundedCollect.Buf(cap)

  override def update(buf: BoundedCollect.Buf, input: InternalRow): BoundedCollect.Buf = {
    val v = child.eval(input)
    // copy (detaching UTF8Strings / InternalRows from reused buffers)
    // happens inside offer ONLY when the value is actually kept — an
    // overflowed group absorbs the rest of its input allocation-free
    if (v != null) buf.offer(v, BoundedCollect.copyIn)
    buf
  }

  override def merge(buf: BoundedCollect.Buf, other: BoundedCollect.Buf): BoundedCollect.Buf = {
    buf.absorb(other)
    buf
  }

  override def eval(buf: BoundedCollect.Buf): Any =
    if (buf.overflowed) null else new GenericArrayData(buf.toArray)

  override def serialize(buf: BoundedCollect.Buf): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeBoolean(buf.overflowed)
    if (!buf.overflowed) ValueFraming.write(out, buf.size, buf.foreach, valueProj)
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): BoundedCollect.Buf = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val buf = createAggregationBuffer()
    if (in.readBoolean()) buf.markOverflowed()
    // freshly read bytes are owned by this buffer — no re-copy
    else ValueFraming.read(in, child.dataType)(
      buf.offer(_, BoundedCollect.identityCopy))
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BoundedCollect =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BoundedCollect =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): BoundedCollect =
    copy(child = newChildren.head)
}

object BoundedCollect {
  import org.apache.spark.sql.graftshim.ColumnShim

  /** Detach a value from reused upstream buffers (update path). */
  val copyIn: Any => Any = InternalRow.copyValue
  /** Pass-through for values that already own their storage. */
  val identityCopy: Any => Any = v => v

  /** cap-bounded value list with a sticky overflow bit. `copy` runs
    * ONLY when the value is kept — overflowed groups reject
    * allocation-free. */
  final class Buf(cap: Int) {
    private val xs = new scala.collection.mutable.ArrayBuffer[Any]()
    private var over = false
    def overflowed: Boolean = over
    def markOverflowed(): Unit = { over = true; xs.clear() }
    def offer(v: Any, copy: Any => Any): Unit =
      if (!over) {
        if (xs.length == cap) markOverflowed() else xs += copy(v)
      }
    def absorb(other: Buf): Unit =
      if (other.over) markOverflowed()
      else other.xs.foreach(offer(_, identityCopy))
    def size: Int = xs.length
    def foreach(f: Any => Unit): Unit = xs.foreach(f)
    def toArray: Array[Any] = xs.toArray
  }

  def column(c: Column, cap: Int): Column =
    ColumnShim.column(BoundedCollect(ColumnShim.expression(c), cap).toAggregateExpression())
}
