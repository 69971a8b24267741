package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.CatalystTypeConverters
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.types.{DataType, IntegerType}

/** `search_sorted(v)` = number of `bounds` ≤ `v` (binary search over a
  * driver-computed sorted literal array). Used to assign a row to an
  * ordered range slice as a PURE FUNCTION of the value: unlike
  * `repartitionByRange` + `spark_partition_id()`, the result does not
  * depend on which physical execution sampled the range bounds, so two
  * plan subtrees computing it over the same data always agree — no
  * reliance on `spark.sql.exchange.reuse` deduping identical exchanges
  * (RangePartitioner seeds its reservoir sample on the RDD id, which
  * differs per physical execution).
  *
  * A native expression rather than an `aggregate`/`filter` HOF over a
  * literal array: the HOF is O(#bounds) interpreted comparisons per row
  * — at thousands of slices (a 1000-executor cluster) that is real
  * per-row cost; binary search is O(log #bounds). One node in the plan,
  * so no expression-tree blowup either (see MinHashExpr's rationale).
  * CodegenFallback: the surrounding projection stays codegen'd.
  *
  * `bounds` must be sorted by the Catalyst ordering of `child.dataType`
  * and hold Catalyst-internal values (use [[SearchSorted.column]]).
  * An IndexedSeq (not Array) so structural equality holds across
  * expression copies — plan canonicalization and `sameResult` work.
  */
case class SearchSorted(child: Expression, bounds: IndexedSeq[Any])
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "search_sorted"

  /** Orderability + bounds/input class parity checked at ANALYSIS: the
    * ordering is built from child.dataType but applied to the
    * caller-supplied bounds, so a mismatch (int input, long bounds)
    * previously surfaced as a per-row ClassCastException deep inside a
    * stage instead of a plan-time error (review r6). */
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    import org.apache.spark.sql.types._
    if (!org.apache.spark.sql.catalyst.expressions.RowOrdering.isOrderable(child.dataType))
      return TypeCheckResult.TypeCheckFailure(
        s"$prettyName input type ${child.dataType} is not orderable")
    val expected: Option[Class[_]] = child.dataType match {
      case LongType | TimestampType | TimestampNTZType => Some(classOf[java.lang.Long])
      case IntegerType | DateType => Some(classOf[java.lang.Integer])
      case DoubleType => Some(classOf[java.lang.Double])
      case FloatType => Some(classOf[java.lang.Float])
      case ShortType => Some(classOf[java.lang.Short])
      case ByteType => Some(classOf[java.lang.Byte])
      case BooleanType => Some(classOf[java.lang.Boolean])
      case StringType => Some(classOf[org.apache.spark.unsafe.types.UTF8String])
      case _ => None
    }
    expected.flatMap(cls => bounds.find(b => b != null && !cls.isInstance(b))) match {
      case Some(bad) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName bounds hold ${bad.getClass.getName} values but the " +
          s"input is ${child.dataType} — pass the input's own type")
      case None => TypeCheckResult.TypeCheckSuccess
    }
  }

  @transient private lazy val ord =
    TypeUtils.getInterpretedOrdering(child.dataType)

  override protected def nullSafeEval(v: Any): Any = {
    var lo = 0
    var hi = bounds.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (ord.lteq(bounds(mid), v)) lo = mid + 1 else hi = mid
    }
    lo
  }

  override protected def withNewChildInternal(newChild: Expression): SearchSorted =
    copy(child = newChild)
}

object SearchSorted {
  import org.apache.spark.sql.graftshim.ColumnShim

  /** Wrap as a Column, converting external `bounds` values (already
    * sorted externally or not — they are re-sorted here with the
    * Catalyst ordering, which for strings is UTF8 byte order, not
    * UTF-16 code-unit order) to Catalyst-internal form. */
  def column(c: Column, dt: DataType, bounds: Seq[Any]): Column = {
    val toInternal = CatalystTypeConverters.createToCatalystConverter(dt)
    val ord = TypeUtils.getInterpretedOrdering(dt)
    val internal = bounds.map(toInternal).sorted(ord).toIndexedSeq
    ColumnShim.column(SearchSorted(ColumnShim.expression(c), internal))
  }
}
