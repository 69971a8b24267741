package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, RowOrdering, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{GenericArrayData, TypeUtils}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

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
  * Accepts any ORDERABLE type (atomics, and structs of them — which is
  * how [[Quota.topKPerKey]] carries whole rows through the cut);
  * values serialize for the partial→final hand-off as single-field
  * UnsafeRows. Nulls are ignored, as every Spark aggregate does.
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
  override def checkInputDataTypes(): TypeCheckResult =
    // NullType is "orderable" to RowOrdering but has no interpreted
    // ordering — reject it here for a readable analysis-time error
    // instead of a runtime MatchError (SQL: bounded_min_k(NULL, 2))
    if (child.dataType != NullType && RowOrdering.isOrderable(child.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"bounded_min_k requires an orderable non-null type, got ${child.dataType}")

  // Struct values (the topKPerKey whole-row carrier) compare through a
  // CODEGEN'd ordering — InterpretedOrdering walks the field list with
  // per-field boxing on EVERY heap comparison, measured as the
  // dominant per-row cost of the aggregate. Same SQL ordering
  // semantics (NaN/-0.0 normalization included) either way.
  @transient private lazy val ord: Ordering[Any] = child.dataType match {
    case st: StructType =>
      org.apache.spark.sql.catalyst.expressions.codegen.GenerateOrdering
        .create(st).asInstanceOf[Ordering[Any]]
    case dt => TypeUtils.getInterpretedOrdering(dt)
  }

  // Copy applied ONLY when a value is admitted to the heap (offer
  // compares first on the transient value): once a group's heap is
  // full, the common rejected row costs eval + one compiled compare,
  // zero allocation. Struct admits copy through a compact
  // UnsafeProjection instead of a generic field-by-field copy.
  @transient private lazy val copyV: Any => Any = child.dataType match {
    case st: StructType =>
      val proj = UnsafeProjection.create(st)
      (v: Any) => proj(v.asInstanceOf[InternalRow]).copy()
    case _ => (v: Any) => InternalRow.copyValue(v)
  }

  @transient private lazy val valueProj: UnsafeProjection =
    UnsafeProjection.create(Array(child.dataType))

  override def createAggregationBuffer(): BoundedMinK.Heap =
    new BoundedMinK.Heap(k, ord)

  override def update(buf: BoundedMinK.Heap, input: InternalRow): BoundedMinK.Heap = {
    val v = child.eval(input)
    if (v != null) buf.offer(v, copyV)
    buf
  }

  override def merge(buf: BoundedMinK.Heap, other: BoundedMinK.Heap): BoundedMinK.Heap = {
    // other's values are already detached copies owned by a buffer that
    // is discarded after the merge — share, don't re-copy
    other.foreach(buf.offer(_, BoundedMinK.identityCopy))
    buf
  }

  override def eval(buf: BoundedMinK.Heap): Any =
    new GenericArrayData(buf.sortedAscending())

  // Wire framing shared with BoundedCollect — see [[ValueFraming]].
  override def serialize(buf: BoundedMinK.Heap): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    ValueFraming.write(out, buf.size, buf.foreach, valueProj)
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): BoundedMinK.Heap = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val buf = createAggregationBuffer()
    // the freshly read bytes are owned by this heap — no re-copy
    ValueFraming.read(in, child.dataType)(
      buf.offer(_, BoundedMinK.identityCopy))
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

  /** Pass-through for values that already own their storage (merge /
    * deserialize paths). */
  val identityCopy: Any => Any = v => v

  /** k-capped max-at-head heap of the k SMALLEST values seen. `copy`
    * detaches a value from reused upstream buffers and runs ONLY on
    * admission — a full heap rejects without allocating. */
  final class Heap(k: Int, ord: Ordering[Any]) {
    private val pq = new scala.collection.mutable.PriorityQueue[Any]()(ord)
    def offer(v: Any, copy: Any => Any): Unit =
      if (pq.size < k) pq.enqueue(copy(v))
      else if (ord.lt(v, pq.head)) { pq.dequeue(); pq.enqueue(copy(v)) }
    def size: Int = pq.size
    def foreach(f: Any => Unit): Unit = pq.iterator.foreach(f)
    def sortedAscending(): Array[Any] = pq.toArray.sorted(ord)
  }

  def column(c: Column, k: Int): Column =
    ColumnShim.column(BoundedMinK(ColumnShim.expression(c), k).toAggregateExpression())
}

/** Per-key quota operators built on [[BoundedMinK]]. */
object Quota {

  /** Keep the `k` smallest rows per `keyCol`, ordered by `ordCol` —
    * per-domain document caps, per-user recent-N, any "at most k rows
    * per key" cut. ALL columns of `df` survive (rows ride through the
    * bounded heap as structs); ties on `ordCol` break deterministically
    * by the remaining columns in their frame order, so the output is
    * exactly min(k, group size) rows per key — never more, even with
    * duplicate `ordCol` values. Every column must be orderable (it
    * participates in the struct comparison). Rows with a NULL `ordCol`
    * are dropped, matching aggregate null semantics (the struct wrapper
    * would otherwise smuggle them in sorted first and let them consume
    * quota slots — review r4).
    *
    * One hash aggregation: partial bounded heaps on the map side,
    * merged on the reduce side, then exploded back to rows. The
    * `row_number()`-window formulation of the same cut ships a hot
    * key's ENTIRE row set to one reducer; this ships ≤ k per (key, map
    * task). */
  def topKPerKey(df: DataFrame, keyCol: String, ordCol: String, k: Int): DataFrame = {
    require(keyCol != ordCol, s"keyCol and ordCol must differ, got '$keyCol'")
    // backticks / getField address columns LITERALLY — a bare col("a.b")
    // would parse a dotted column name as nested field access; embedded
    // backticks are doubled (the standard identifier escape) so a name
    // containing one cannot produce a malformed quoted identifier
    def c0(c: String): Column = col(s"`${c.replace("`", "``")}`")
    val payload = ordCol +: df.columns.filterNot(c => c == keyCol || c == ordCol).toIndexedSeq
    val rowStruct = struct(payload.map(c => c0(c).as(c)): _*)
    df.filter(c0(ordCol).isNotNull)
      // pre-project the row struct: built by the codegen'd stage once
      // per row instead of interpreted inside the aggregate's update
      .select(c0(keyCol), rowStruct.as("__rowstruct"))
      .groupBy(c0(keyCol))
      .agg(BoundedMinK.column(col("__rowstruct"), k).as("__mink"))
      .select(c0(keyCol), explode(col("__mink")).as("__row"))
      .select(c0(keyCol) +: payload.map(c => col("__row").getField(c).as(c)): _*)
  }
}
