package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{GenericArrayData, TypeUtils}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `bounded_min_k(v, k)`: the k smallest values of `v` per group, as a
  * sorted array — a BOUNDED native aggregate for per-key top-k cuts.
  *
  * Why a custom `TypedImperativeAggregate`: Spark has no bounded
  * collect — the built-in way to take "first k per key" is either a
  * `row_number()` window (shuffles EVERY row of a hot key to one
  * reducer before cutting — the skew bomb) or
  * `slice(array_sort(collect_list(v)), 1, k)` (the aggregation buffer
  * holds the whole group before the slice — O(group) memory on the
  * reducer). This aggregate's state is a k-capped binary heap: update
  * is O(log k), map-side partial aggregation applies (it is an
  * ImperativeAggregate, so ObjectHashAggregate runs partial→final),
  * and the shuffle carries AT MOST k values per (key, map task)
  * regardless of how hot the key is. A domain with 10⁹ documents costs
  * each mapper k values, never 10⁹.
  *
  * Value types: int / long / double / float / string / timestamp / date
  * (the orderable atomics a quota cut keys on). Nulls are ignored, as
  * every Spark aggregate does.
  */
case class BoundedMinK(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[BoundedMinK.Heap] {

  require(k > 0, s"k must be positive, got $k")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(child.dataType, containsNull = false)
  override def prettyName: String = "bounded_min_k"

  // validated at analysis time (the Column wrapper sees an UNRESOLVED
  // attribute whose dataType is not yet known)
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (BoundedMinK.supported(child.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"bounded_min_k does not support ${child.dataType}")

  @transient private lazy val ord: Ordering[Any] =
    TypeUtils.getInterpretedOrdering(child.dataType)

  override def createAggregationBuffer(): BoundedMinK.Heap =
    new BoundedMinK.Heap(k, ord)

  override def update(buf: BoundedMinK.Heap, input: InternalRow): BoundedMinK.Heap = {
    val v = child.eval(input)
    if (v != null) buf.offer(v match {
      case s: UTF8String => s.copy() // row buffers are reused
      case other => other
    })
    buf
  }

  override def merge(buf: BoundedMinK.Heap, other: BoundedMinK.Heap): BoundedMinK.Heap = {
    other.foreach(buf.offer)
    buf
  }

  override def eval(buf: BoundedMinK.Heap): Any =
    new GenericArrayData(buf.sortedAscending())

  override def serialize(buf: BoundedMinK.Heap): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { v =>
      child.dataType match {
        case IntegerType | DateType => out.writeInt(v.asInstanceOf[Int])
        case LongType | TimestampType | TimestampNTZType => out.writeLong(v.asInstanceOf[Long])
        case DoubleType => out.writeDouble(v.asInstanceOf[Double])
        case FloatType => out.writeFloat(v.asInstanceOf[Float])
        case StringType =>
          val b = v.asInstanceOf[UTF8String].getBytes
          out.writeInt(b.length); out.write(b)
        case dt => throw new IllegalStateException(s"unsupported type $dt")
      }
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): BoundedMinK.Heap = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) {
      val v: Any = child.dataType match {
        case IntegerType | DateType => in.readInt()
        case LongType | TimestampType | TimestampNTZType => in.readLong()
        case DoubleType => in.readDouble()
        case FloatType => in.readFloat()
        case StringType =>
          val len = in.readInt(); val b = new Array[Byte](len)
          in.readFully(b); UTF8String.fromBytes(b)
        case dt => throw new IllegalStateException(s"unsupported type $dt")
      }
      buf.offer(v)
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BoundedMinK =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BoundedMinK =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): BoundedMinK =
    copy(child = newChildren.head)
}

object BoundedMinK {
  import org.apache.spark.sql.graftshim.ColumnShim

  private[functions] def supported(dt: DataType): Boolean = dt match {
    case IntegerType | DateType | LongType | TimestampType | TimestampNTZType |
         DoubleType | FloatType | StringType => true
    case _ => false
  }

  /** k-capped max-at-head heap of the k SMALLEST values seen. */
  final class Heap(k: Int, ord: Ordering[Any]) {
    private val pq = new scala.collection.mutable.PriorityQueue[Any]()(ord)
    def offer(v: Any): Unit =
      if (pq.size < k) pq.enqueue(v)
      else if (ord.lt(v, pq.head)) { pq.dequeue(); pq.enqueue(v) }
    def size: Int = pq.size
    def foreach(f: Any => Unit): Unit = pq.iterator.foreach(f)
    def sortedAscending(): Array[Any] = pq.toArray.sorted(ord)
  }

  def column(c: Column, k: Int): Column =
    ColumnShim.column(BoundedMinK(ColumnShim.expression(c), k).toAggregateExpression())
}

/** Per-key quota operators built on [[BoundedMinK]]. */
object Quota {

  /** Keep the `k` smallest `ordCol` rows per `keyCol` — per-domain
    * document caps, per-user recent-N, any "at most k rows per key"
    * cut. One hash aggregation: partial bounded heaps on the map side,
    * merged on the reduce side, then exploded back to rows. The
    * `row_number()`-window formulation of the same cut ships a hot
    * key's ENTIRE row set to one reducer; this ships ≤ k per (key, map
    * task). */
  def topKPerKey(df: DataFrame, keyCol: String, ordCol: String, k: Int): DataFrame =
    df.groupBy(col(keyCol))
      .agg(BoundedMinK.column(col(ordCol), k).as("__mink"))
      .select(col(keyCol), explode(col("__mink")).as(ordCol))
}
