package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.util.sketch.BloomFilter

/** Bloom-filter semi-join pruning — the manual form of the runtime
  * filter every warehouse engine injects for selective dimension
  * joins: build a compact membership sketch of the SMALL side's join
  * keys, push it into the BIG side's scan as a narrow codegen'd
  * predicate, and only then shuffle what survives for the exact join.
  *
  * Why it matters at 100 TB: a fact-table join shuffles the entire
  * probe side before the join discards the misses. When the dimension
  * side is selective (1% of orders), the bloom pre-filter drops ~99%
  * of probe rows AT THE SCAN — before the exchange — for the cost of
  * a few MB of sketch shipped once per task binary. False positives
  * only cost wasted shuffle rows; the exact join behind the filter
  * keeps the result precise, so correctness never depends on the
  * sketch (the oracle for a bloom-pruned query is the plain join).
  *
  * Spark itself injects this shape only under AQE with
  * `spark.sql.optimizer.runtimeFilter.bloomFilter.enabled`; exposing
  * it as a library operator makes the pruning explicit, testable, and
  * available when the optimizer's heuristics decline.
  *
  * Sizing: the sketch is built with the dimension side's exact key
  * count (one cheap count on the SMALL side) at the given fpp; at 1%
  * fpp a 10-million-key dimension costs ~12 MB — broadcast-scale. For
  * dimension sides too large for a driver sketch, fall back to a
  * shuffle semi-join (the sketch no longer pays for itself).
  */
object BloomJoin {

  /** `mightContain(bloom, key)` as a native whole-stage-codegen
    * predicate: the sketch rides the expression into the generated
    * scan-stage code (one reference object, no UDF boxing, no
    * interpreted path), so pruning runs at scan speed next to the
    * pushed parquet filters. */
  case class BloomMightContain(child: Expression, bloom: BloomFilter)
      extends UnaryExpression {

    override def dataType: DataType = BooleanType
    override def prettyName: String = "bloom_might_contain"

    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case LongType | IntegerType | ShortType | ByteType =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName needs an integral key, got $other")
    }

    private def toLong(v: Any): Long = v match {
      case l: Long => l
      case i: Int => i.toLong
      case s: Short => s.toLong
      case b: Byte => b.toLong
    }

    override protected def nullSafeEval(v: Any): Any =
      bloom.mightContainLong(toLong(v))

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("bloom", bloom, classOf[BloomFilter].getName)
      nullSafeCodeGen(ctx, ev, v => s"${ev.value} = $ref.mightContainLong((long) $v);")
    }

    override protected def withNewChildInternal(newChild: Expression): BloomMightContain =
      copy(child = newChild)
  }

  def mightContain(key: Column, bloom: BloomFilter): Column = {
    import org.apache.spark.sql.graftshim.ColumnShim
    ColumnShim.column(BloomMightContain(ColumnShim.expression(key), bloom))
  }

  /** Prune `big` to rows whose `bigKey` might appear in `small`'s
    * `smallKey` set (superset of the exact semi-join: all true matches
    * survive, plus ~fpp false positives). Runs one exact DISTINCT count
    * on the small side to size the sketch — a duplicate-heavy small
    * side sized by raw row count shipped a sketch up to dup-factor×
    * larger than needed to every task (review r6). INTEGRAL keys only
    * (the codegen'd probe is mightContainLong), checked BEFORE the
    * small-side jobs run rather than failing at probe analysis after
    * both jobs already paid. Follow with the exact join — the pruned
    * probe side is what makes that join's shuffle cheap. */
  def pruneByBloom(big: DataFrame, bigKey: String,
      small: DataFrame, smallKey: String, fpp: Double = 0.01): DataFrame = {
    locally {
      import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}
      Seq((big, bigKey), (small, smallKey)).foreach { case (df, k) =>
        val t = df.schema(k).dataType
        require(Seq(ByteType, ShortType, IntegerType, LongType).contains(t),
          s"pruneByBloom needs integral keys; '$k' is $t — hash other " +
            "key types to longs (e.g. xxhash64) on both sides first")
      }
    }
    val n = small.agg(countDistinct(col(smallKey))).head().getLong(0)
    val bloom = small.stat.bloomFilter(smallKey, math.max(n, 1L), fpp)
    big.filter(mightContain(col(bigKey), bloom))
  }
}
