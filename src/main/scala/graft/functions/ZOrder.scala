package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Z-order (Morton) curve utilities — the multi-dimensional data-layout
  * key behind lakehouse OPTIMIZE ZORDER BY: interleaving the bits of
  * two clustering keys gives a 1-d sort order whose contiguous ranges
  * are small RECTANGLES in (x, y) space, so files written in z order
  * carry tight min/max stats on BOTH columns and predicates on either
  * column prune files — a plain sort clusters only its leading column.
  *
  * At 100 TB the layout move is `df.repartitionByRange(N, zCol)` (or a
  * range-sorted write) ahead of the parquet sink: the z-value is a pure
  * narrow projection (bit arithmetic, codegen'd, no shuffle of its
  * own), and the range exchange replaces whatever partitioning the
  * write needed anyway. Everything here is exact BIGINT arithmetic —
  * cross-engine replayable, no FP contract needed.
  */
object ZOrder {

  /** Morton-interleave the low `bits` bits of two non-negative integer
    * columns: result bit 2i is a's bit i, bit 2i+1 is b's bit i.
    * Callers clamp/scale inputs into [0, 2^bits) first (masking keeps
    * the expression total on dirty data).
    *
    * DELIBERATE TWIN of [[graft.sources.ZOrder.zValueN]] with a
    * different dirty-data contract: this form is TOTAL (caller masks,
    * out-of-range silently wraps — the analytics-expression shape),
    * while the sources variant RAISES on out-of-range dims because it
    * decides durable file layout, where silent aliasing quietly
    * destroys the cubic clustering of written data. Do not merge them
    * without picking one contract: layouts already written with one
    * bit order must keep reading with it. */
  def interleave(a: Column, b: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1, 31], got $bits")
    (0 until bits).map { i =>
      shiftleft(shiftright(a, i).bitwiseAND(lit(1L)), 2 * i) +
        shiftleft(shiftright(b, i).bitwiseAND(lit(1L)), 2 * i + 1)
    }.reduce(_ + _)
  }

  /** The matching DuckDB/ANSI SQL expression text (for oracles and
    * pushdown-to-warehouse uses): fully parenthesized so `>> & << +`
    * precedence can't differ across dialects. */
  def interleaveSql(a: String, b: String, bits: Int): String =
    (0 until bits).flatMap { i =>
      Seq(s"((($a >> $i) & 1) << ${2 * i})", s"((($b >> $i) & 1) << ${2 * i + 1})")
    }.mkString(" + ")
}
