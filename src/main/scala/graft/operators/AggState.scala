package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental aggregate maintenance: a per-key state table of
  * ASSOCIATIVE, MERGEABLE aggregates (count / sum / min / max) that a
  * new batch updates without re-reading history — the materialized
  * counter table behind "lifetime order count", "max basket value"
  * style features, and the batch dual of the streaming stateful
  * aggregation.
  *
  * The contract is algebraic: `merge(fromBatch(a), fromBatch(b)) ==
  * fromBatch(a ∪ b)` (EngineSpec + the oracle pin it), which is what
  * lets 100 TB of history live as a compact state table updated by
  * daily deltas. Derived, NON-mergeable views (avg = sum/cnt) are
  * computed at read time from the state, never stored.
  *
  * Scale shape: `fromBatch` is one map-side-combinable aggregation of
  * the batch; `merge` unions two KEY-sized tables and re-aggregates —
  * the corpus-sized event log is touched only by its own delta's
  * aggregation. Write the state bucketed by key
  * ([[graft.sources.Bucketing]]) and the merge's shuffle disappears
  * too.
  */
object AggState {

  private val StateCols = Seq("cnt", "sum", "min", "max")

  /** Collapse a batch of (keys…, valueCol) into one state row per key. */
  def fromBatch(batch: DataFrame, keys: Seq[String], valueCol: String): DataFrame =
    batch.groupBy(keys.map(col): _*)
      .agg(
        count(col(valueCol)).as("cnt"),
        sum(col(valueCol)).as("sum"),
        min(col(valueCol)).as("min"),
        max(col(valueCol)).as("max"))

  /** Merge two state tables (either may have keys the other lacks).
    * Key columns are INFERRED as everything outside [[StateCols]] — so
    * both sides must carry exactly (keys ++ StateCols): a stray extra
    * column (a leftover updated_at stamp, a partition column) would
    * silently become a grouping key and break per-key uniqueness. The
    * schema-equality require makes that loud. */
  def merge(state: DataFrame, delta: DataFrame): DataFrame = {
    require(StateCols.forall(state.columns.contains) &&
      StateCols.forall(delta.columns.contains),
      s"state tables need columns $StateCols")
    require(state.columns.sorted.sameElements(delta.columns.sorted),
      s"state/delta column sets differ (${state.columns.sorted.mkString(",")} " +
        s"vs ${delta.columns.sorted.mkString(",")}) — every non-state column " +
        "is treated as a key, so a stray column would silently change the " +
        "key grain; project both sides to (keys ++ cnt,sum,min,max) first")
    val keys = state.columns.filterNot(StateCols.contains).toSeq
    state.unionByName(delta)
      .groupBy(keys.map(col): _*)
      .agg(
        sum(col("cnt")).as("cnt"),
        sum(col("sum")).as("sum"),
        min(col("min")).as("min"),
        max(col("max")).as("max"))
  }
}
