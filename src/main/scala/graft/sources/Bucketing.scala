package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table support: the co-located-join primitive for 100 TB
  * feature tables.
  *
  * A feature table that is re-joined on the same entity keys every
  * retrieval (the PIT join's candidate equi-join, incremental-dedup
  * anti-joins, the online materialize latest-per-key aggregation)
  * should be bucketed by those keys ON WRITE: both sides of a
  * same-bucketing equi-join then report `HashPartitioning` straight
  * from the scan and Catalyst plans NO exchange — the join's shuffle,
  * the single biggest cost of repeated retrievals, is paid once at
  * ingest instead of per query. sortBy on the same keys additionally
  * lets sort-merge joins skip their sorts.
  *
  * Spark requires a catalog entry for bucketing metadata (the bucket
  * spec lives in the table, not the files), so this writes an EXTERNAL
  * table: files at `path`, bucket spec in the session catalog.
  * PlanSpec pins the zero-exchange property.
  */
object Bucketing {

  def writeBucketed(
      df: DataFrame,
      path: String,
      table: String,
      keys: Seq[String],
      buckets: Int): Unit = {
    require(keys.nonEmpty, "bucketing needs at least one key")
    // Pre-shuffle into the bucket partitioning: repartition(n, keys)
    // and bucketBy(n, keys) use the same murmur3 HashPartitioning, so
    // each task then owns exactly one bucket and writes exactly one
    // file. One-file-per-bucket is what lets the scan report its
    // sortBy order (multi-file buckets force a Sort below SMJ — Spark
    // only trusts per-file order) and avoids the
    // files-per-bucket-per-writer small-file explosion at scale.
    df.repartition(buckets, keys.map(org.apache.spark.sql.functions.col): _*)
      .write.mode("overwrite")
      .option("path", path)
      .bucketBy(buckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .format("parquet")
      .saveAsTable(table)
  }

  def readBucketed(spark: SparkSession, table: String): DataFrame =
    spark.table(table)
}
