package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native vector dot product with FULL whole-stage codegen (`doGenCode`
  * emits the primitive loop inline into the stage).
  *
  * This is the hot inner loop of every similarity path — brute-force
  * ANN scores |queries|×|corpus| pairs, margin mining, label-noise
  * screening, embedding near-dup verification all bottom out here. The
  * `aggregate(zip_with(...))` HOF formulation it replaces materializes
  * a boxed product array per pair and folds it interpreted (lambdas get
  * no codegen); this expression is `acc += a[i]*b[i]` fused into the
  * surrounding generated code — no allocation, no virtual calls, no
  * boxing.
  *
  * Determinism contract unchanged: ascending-index left-associative
  * double accumulation — the exact fold order of the HOF version AND of
  * DuckDB's `list_dot_product`, so every existing cosine oracle stays
  * bit-identical. Null semantics also match the HOF version: a null
  * element nulls the product; mismatched lengths null the result (the
  * zip_with null-pad behavior).
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "vec_dot"

  private def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(e: Expression): Boolean = e.dataType match {
      case ArrayType(t, _) => t.isInstanceOf[NumericType]
      case _ => false
    }
    if (ok(left) && ok(right)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs two numeric arrays, got ${left.dataType} / ${right.dataType}")
  }

  private def getter(t: DataType, arr: String, i: String): String = t match {
    case FloatType => s"$arr.getFloat($i)"
    case DoubleType => s"$arr.getDouble($i)"
    case IntegerType => s"$arr.getInt($i)"
    case LongType => s"$arr.getLong($i)"
    case ShortType => s"$arr.getShort($i)"
    case ByteType => s"$arr.getByte($i)"
    case other => throw new IllegalStateException(s"unsupported element type $other")
  }

  private def get(t: DataType, arr: ArrayData, i: Int): Double = t match {
    case FloatType => arr.getFloat(i).toDouble
    case DoubleType => arr.getDouble(i)
    case IntegerType => arr.getInt(i).toDouble
    case LongType => arr.getLong(i).toDouble
    case ShortType => arr.getShort(i).toDouble
    case ByteType => arr.getByte(i).toDouble
    case other => throw new IllegalStateException(s"unsupported element type $other")
  }

  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val (a, b) = (l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])
    val n = a.numElements()
    if (n != b.numElements()) return null
    val (lt, rt) = (elemType(left), elemType(right))
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      acc += get(lt, a, i) * get(rt, b, i)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $acc += (double)(${getter(elemType(left), a, i)})
         |          * (double)(${getter(elemType(right), b, i)});
         |  }
         |  if (!${ev.isNull}) { ${ev.value} = $acc; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

object DotProductExpr {
  import org.apache.spark.sql.graftshim.ColumnShim

  def dot(a: Column, b: Column): Column =
    ColumnShim.column(DotProduct(ColumnShim.expression(a), ColumnShim.expression(b)))
}
