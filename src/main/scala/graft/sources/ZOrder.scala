package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) layout for multi-dimension row-group pruning.
  *
  * A table sorted by one column prunes parquet row groups only on that
  * column's predicates; a 100 TB events table queried by BOTH
  * entity-key ranges and time ranges (or lat/lon, or user×score) leaves
  * the second dimension unpruned — every row group overlaps. Sorting by
  * the interleaved bits of both dimensions (the Morton curve) keeps
  * row groups CUBIC in dimension space, so min/max footer stats exclude
  * groups on every interleaved dimension at once. This is a pure LAYOUT
  * choice: no reader changes, no index — the same parquet scan just
  * skips more (ZOrderSpec measures the skip-rate difference on real
  * footer statistics).
  *
  * `zValue2` is 4·bits shift/mask/or terms — a plain codegen'd
  * projection; the write is one repartitionByRange+sortWithinPartitions
  * on the z-value (one shuffle, the same cost as any clustered write).
  * Dimensions must first be mapped to non-negative ints < 2^bits —
  * rank-bucket skewed/continuous columns with [[graft.functions.SearchSorted]]
  * quantile bounds (equi-depth), or clamp naturally-small domains.
  */
object ZOrder {

  /** Morton-interleave two bucketed dimensions (each in [0, 2^bits)):
    * bit i of `a` lands at result bit 2i, bit i of `b` at 2i+1. */
  def zValue2(a: Column, b: Column, bits: Int = 16): Column =
    zValueN(Seq(a, b), bits)

  /** N-dimensional Morton interleave (round-robin: bit i of dim d lands
    * at result bit i·n + d). Each dim must be in [0, 2^bits) and
    * n·bits ≤ 63 — out-of-range values would silently ALIAS (x and
    * x+2^bits interleave identically) and quietly destroy the cubic
    * layout, so the projection raises instead; zero extra passes. */
  def zValueN(dims: Seq[Column], bits: Int): Column = {
    require(dims.size >= 2, s"zValueN needs >= 2 dims, got ${dims.size}")
    require(bits >= 1 && dims.size * bits <= 63,
      s"need 1 <= bits and dims*bits <= 63, got ${dims.size} x $bits")
    val lim = 1L << bits
    val n = dims.size
    def checked(c: Column, d: Int): Column =
      when(c.cast("long").isNull || c.cast("long") < 0 || c.cast("long") >= lim,
        raise_error(concat(lit(s"zValueN: dim $d out of [0, $lim): "), c.cast("string"))))
        .otherwise(c.cast("long"))
    val terms: Seq[Column] = dims.zipWithIndex.flatMap { case (c, d) =>
      val cv = checked(c, d)
      (0 until bits).map(i =>
        shiftleft(shiftrightunsigned(cv, i).bitwiseAND(lit(1L)), i * n + d))
    }
    terms.reduce((x, y) => x.bitwiseOR(y))
  }

  /** Write `df` z-ordered by two bucketed dimension columns: range
    * partition + in-partition sort on the z-value, so each output file
    * (and each row group inside it) covers one compact Morton segment.
    * `rowGroupBytes` tunes pruning granularity (default parquet 128 MB
    * row groups are the unit of skipping). */
  def writeZOrdered(
      df: DataFrame,
      path: String,
      dimA: String,
      dimB: String,
      bits: Int = 16,
      numFiles: Int = 32,
      rowGroupBytes: Option[Long] = None): Unit = {
    val z = zValue2(col(dimA), col(dimB), bits).as("__z")
    val sorted = df.withColumn("__z", z)
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
    // publication rides StagedWrite's checked, self-healing dir-swap —
    // the hand-rolled swap this replaced ignored rename results and
    // then deleted the .old copy unconditionally, so a failed publish
    // destroyed the live layout (review r6); StagedWrite also heals a
    // crashed swap and sweeps stale .stage-* dirs on the next write
    StagedWrite.parquet(sorted, path, "overwrite",
      options = rowGroupBytes.map(b => "parquet.block.size" -> b.toString).toMap)
  }
}
