package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Rolling time-range feature aggregation: for every event row, the
  * aggregates of that key's events inside a trailing wall-clock window
  * (e.g. "count and sum of the user's events over the preceding 7
  * days, as of each event"). The standard derived-feature shape a
  * feature platform computes in front of [[PointInTimeJoin]] — the
  * reference leaves this to upstream SQL; here it is a first-class
  * operator (the batch analog of the streaming windowed aggregation in
  * `StreamMaterializer`).
  *
  * Implementation: a per-key RANGE window over epoch seconds —
  * `Window.partitionBy(keys).orderBy(epochSec).rangeBetween(-window, 0)`.
  * Scale shape: ONE hash shuffle by key, then a per-key sort; window
  * state is bounded by the window span, never the partition. No
  * self-join (the naive events-x-events range join is O(n·w) and a
  * skew magnet). Per-key row counts bound memory: a key's rows stream
  * through the sort in Tungsten pages and spill if needed.
  *
  * The frame is defined on WHOLE seconds (timestamps truncated toward
  * the epoch) so the boundary is engine-portable: sub-second precision
  * differs across engines/stores, whole seconds do not.
  */
object RollingFeatures {

  /** @param aggs (outputName, aggregate-over-window) pairs built from
    *             columns of `df`, e.g. `"cnt_7d" -> count(lit(1))`. */
  def rollingAgg(
      df: DataFrame,
      keyCols: Seq[String],
      tsCol: String,
      windowSeconds: Long,
      aggs: Seq[(String, Column)]): DataFrame = {
    require(windowSeconds > 0, s"windowSeconds must be positive, got $windowSeconds")
    require(aggs.nonEmpty, "at least one aggregate required")
    val w = Window
      .partitionBy(keyCols.map(col): _*)
      .orderBy(col(tsCol).cast("long"))
      .rangeBetween(-windowSeconds, 0)
    // all aggregates in ONE projection: Spark fuses same-window
    // expressions of a single select into one WindowExec (one per-key
    // sort pass); chained withColumn(...).over(w) plans a separate
    // Window + Sort per aggregate
    df.select(df.columns.toIndexedSeq.map(col) ++ aggs.map { case (name, a) => a.over(w).as(name) }: _*)
  }
}
