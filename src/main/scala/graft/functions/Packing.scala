package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-data export packing: assign each document to an output
  * shard so that shards hold ≈ `budgetTokens` consecutive tokens in a
  * deterministic global order (the order of `idCol`). The classic
  * "pack the corpus into N-token shards" step in front of tokenizer /
  * sequence-building jobs:
  *
  *   shard_id(doc) = floor(prefix_tokens_before(doc) / budgetTokens)
  *
  * Distributed prefix sum — never a single global window over the
  * corpus:
  *
  *   1. range-repartition by `idCol`: partition p holds an ordered
  *      slice of the id space (the same shuffle a sorted export needs
  *      anyway);
  *   2. running sums WITHIN each slice via a window keyed by the
  *      physical partition id — each window group is one slice, so
  *      group size is bounded by partition size, not corpus size;
  *   3. cross-slice offsets from the per-slice totals: one row per
  *      slice, so the global ordering window there touches only
  *      #partitions rows (thousands at 100 TB — bounded by design);
  *      they broadcast back to the data.
  *
  * The result is invariant to the range partitioner's sampled bounds:
  * prefix_before(doc) depends only on the global id order, not on
  * where slice boundaries land. Requires `idCol` values be unique
  * (ties would make the within-slice running sum order-ambiguous).
  */
object Packing {

  def packShards(
      df: DataFrame,
      idCol: String,
      tokenCol: String,
      budgetTokens: Long,
      numPartitions: Option[Int] = None): DataFrame = {
    require(budgetTokens > 0, s"budgetTokens must be positive, got $budgetTokens")
    val parts = numPartitions.getOrElse(df.sparkSession.sparkContext.defaultParallelism)
    val tok = col(tokenCol).cast("long")

    val ranged = df.repartitionByRange(parts, col(idCol))
      .withColumn("__pid", spark_partition_id())
    // inclusive running sum within the slice
    val cum = ranged.withColumn("__cum",
      sum(tok).over(Window.partitionBy("__pid").orderBy(idCol)))
    // per-slice totals -> exclusive prefix across slices. `ranged` is
    // referenced by both subtrees — one exchange, reused. The
    // unpartitioned window runs over #partitions rows only.
    val totals = ranged.groupBy("__pid").agg(sum(tok).as("__ptot"))
    val offsets = totals.withColumn("__off",
        coalesce(sum(col("__ptot")).over(
          Window.orderBy("__pid").rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("__pid"), col("__off"))

    cum.join(broadcast(offsets), Seq("__pid"))
      .withColumn("shard_id",
        floor((col("__off") + col("__cum") - tok) / lit(budgetTokens.toDouble)).cast("long"))
      .drop("__pid", "__cum", "__off")
  }
}
