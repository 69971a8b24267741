package graft.sources

import java.sql.Timestamp

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Date-partitioned datasets (reference ingest.py:82-120 for derived
  * partition-column writes; data_source.py:295-306 declares the
  * `date_partition_column` the scans should prune on).
  *
  * At 100 TB this is the biggest scan-cost lever after the ts-bounds
  * predicate: a parquet ts filter only skips row groups INSIDE files the
  * scan still has to list and open, while a date-partition filter prunes
  * whole directories out of the listing (explain shows PartitionFilters,
  * not just PushedFilters).
  */
object DatePartition {

  /** Write `df` partitioned by a date column derived from the event
    * timestamp when absent (ingest.py:104-109). */
  def write(df: DataFrame, path: String, tsCol: String, dateCol: String,
      mode: String = "overwrite"): Unit = {
    val withDate =
      if (df.columns.contains(dateCol)) df
      else df.withColumn(dateCol, to_date(col(tsCol)))
    withDate.write.mode(mode).partitionBy(dateCol).parquet(path)
  }

  /** Inclusive date-range predicate over the partition column — a coarse
    * superset of the ts range [lower, upper], so stacking it under the
    * exact ts filter never changes results, only prunes directories. */
  def pruneFilter(dateCol: String, lower: Option[Timestamp], upper: Option[Timestamp]): Option[Column] = {
    val conds = lower.map(l => col(dateCol) >= to_date(lit(l))).toSeq ++
      upper.map(u => col(dateCol) <= to_date(lit(u))).toSeq
    conds.reduceOption(_ && _)
  }

  /** Apply pruneFilter if the source declares a date partition column. */
  def prune(df: DataFrame, datePartitionColumn: Option[String],
      lower: Option[Timestamp], upper: Option[Timestamp]): DataFrame =
    (for {
      dc <- datePartitionColumn
      f <- pruneFilter(dc, lower, upper)
    } yield df.filter(f)).getOrElse(df)
}
