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

  /** Retention vacuum: drop whole date partitions strictly OLDER than
    * `keepFrom` from a date-partitioned dataset. Partition-level
    * deletion is the 100 TB retention primitive — a directory unlink
    * per expired day, never a rewrite of surviving data (the
    * row-filtering alternative rewrites the whole table to delete 1%
    * of it). Returns the dropped partition names. Hadoop-FS API, so
    * the same call works on local disk, HDFS, or an object store. */
  def vacuum(spark: org.apache.spark.sql.SparkSession, path: String,
      dateCol: String, keepFrom: java.time.LocalDate): Seq[String] = {
    val hadoopPath = new org.apache.hadoop.fs.Path(path)
    val fs = hadoopPath.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(hadoopPath)) return Nil
    val prefix = s"$dateCol="
    fs.listStatus(hadoopPath).toSeq
      .filter(_.isDirectory)
      .map(_.getPath)
      .filter { p =>
        p.getName.startsWith(prefix) &&
          (try java.time.LocalDate.parse(p.getName.stripPrefix(prefix))
              .isBefore(keepFrom)
           catch { case _: java.time.format.DateTimeParseException => false })
      }
      .map { p => fs.delete(p, true); p.getName }
      .sorted
  }
}
