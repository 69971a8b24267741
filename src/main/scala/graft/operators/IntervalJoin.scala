package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Binned (bucketized) interval join: match probe rows whose timestamp
  * falls inside `[start, end)` of an intervals table, with NO equi key
  * required.
  *
  * Why not a plain theta join: `probe.join(intervals, ts >= start &&
  * ts < end)` has no equi condition, so Spark plans a
  * BroadcastNestedLoopJoin (small side) or a CartesianProduct — O(n·m)
  * comparisons that melt down the moment the intervals table stops
  * fitting on one executor. The reference's point-in-time join is the
  * KEYED as-of special case (reference
  * `sdk/python/feast/infra/offline_stores/bigquery.py:605-622` always
  * joins on entity keys first); campaign/window attribution over an
  * event stream needs the keyless general case.
  *
  * The binning rewrite restores an equi key: time is split into
  * fixed-width bins, each interval is exploded to the bins it covers,
  * each probe row computes its single bin, and the join runs as a
  * hash-partitioned equi join on the bin id followed by the exact
  * containment filter. Each (probe, interval) match is produced exactly
  * once — the probe row's bin intersects a covering interval's bin
  * range in exactly one element — so no post-join dedup is needed.
  *
  * 100 TB design notes:
  *   - Shuffle volume: intervals are replicated `ceil(len/W)+1` times;
  *     pick `binWidthSec` ≈ the p95 interval length so the factor is
  *     ~2. Probe rows are never replicated.
  *   - Both sides hash-partition on `__bin`, so the join parallelizes
  *     across the full cluster; a dense time range (many intervals in
  *     one bin) degrades one bucket only, and AQE's skew-join split
  *     handles a pathological bin.
  *   - Optional `equiKeys` columns are folded into the join key when
  *     the workload IS keyed (as-of-with-tolerance shapes), narrowing
  *     buckets further.
  */
object IntervalJoin {

  /** Epoch-micros → bin id. Exact on longs: subtract the remainder
    * first so the division is a whole multiple (the double division is
    * then exact — multiples of `w` below 2^53 divide without rounding),
    * rather than trusting `floor` on an inexact quotient. */
  private def binOfMicros(mc: Column, w: Long): Column =
    ((mc - pmod(mc, lit(w))) / lit(w)).cast("long")

  /** @param probe      fact rows (events); never replicated
    * @param tsCol      probe timestamp column
    * @param intervals  interval rows with `[startCol, endCol)` bounds;
    *                   empty/inverted intervals are dropped
    * @param binWidthSec bin width; ≈ p95 interval length
    * @param equiKeys   (probeCol, intervalCol) pairs additionally
    *                   required equal
    * @return probe ⋈ intervals rows (all columns of both inputs; the
    *         caller resolves name collisions before the call) */
  def binned(
      probe: DataFrame,
      tsCol: String,
      intervals: DataFrame,
      startCol: String,
      endCol: String,
      binWidthSec: Long,
      equiKeys: Seq[(String, String)] = Nil,
      maxBinsPerInterval: Long = 1L << 20): DataFrame = {
    require(binWidthSec > 0, s"binWidthSec must be positive, got $binWidthSec")
    require(maxBinsPerInterval > 0,
      s"maxBinsPerInterval must be positive, got $maxBinsPerInterval")
    // internal working names are claimed with withColumn — a caller
    // column named __bin/__nbins would be silently replaced and then
    // dropped from the output (the Packing reserved-name policy)
    val clash = (probe.columns.filter(_ == "__bin") ++
      intervals.columns.filter(c => c == "__bin" || c == "__nbins")).distinct
    require(clash.isEmpty,
      s"input columns ${clash.mkString(", ")} collide with the interval " +
        "join's internal working names — rename them first")
    val w = binWidthSec * 1000000L

    val probeB = probe.withColumn("__bin", binOfMicros(unix_micros(col(tsCol)), w))
    // end is exclusive: the last covered bin is the one holding end-1µs
    val binLo = binOfMicros(unix_micros(col(startCol)), w)
    val binHi = binOfMicros(unix_micros(col(endCol)) - 1, w)
    val intB = intervals
      .filter(col(endCol) > col(startCol))
      // One bad interval (a year-9999 end, a micros-vs-millis unit slip)
      // would explode sequence() into millions of bins on one task — an
      // opaque executor OOM at 100 TB. Fail loudly naming the row's
      // bounds instead; a deployment with legitimately huge intervals
      // raises the cap (shuffle replication grows with it) or widens
      // the bins.
      .withColumn("__nbins", binHi - binLo + 1)
      .withColumn("__bin", explode(sequence(binLo,
        when(col("__nbins") > maxBinsPerInterval, raise_error(concat(
          lit(s"IntervalJoin.binned: interval covers more than $maxBinsPerInterval bins ("),
          col("__nbins"), lit(" at width "), lit(binWidthSec), lit("s): ["),
          col(startCol).cast("string"), lit(", "), col(endCol).cast("string"),
          lit(") — widen binWidthSec or raise maxBinsPerInterval")))
          .cast("long"))
          .otherwise(binHi))))
      .drop("__nbins")

    val cond = equiKeys.foldLeft(probeB("__bin") === intB("__bin")) {
      case (c, (pk, ik)) => c && probeB(pk) === intB(ik)
    }
    probeB.join(intB, cond, "inner")
      .filter(col(tsCol) >= col(startCol) && col(tsCol) < col(endCol))
      .drop("__bin")
  }
}
