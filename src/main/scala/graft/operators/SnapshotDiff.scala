package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Keyed snapshot diff — the materialization audit: given two
  * snapshots of the same keyed table (e.g. latest-per-key
  * materializations at two cutoffs), report per key whether it was
  * ADDED, REMOVED, or CHANGED, with the old and new compared values
  * side by side. Unchanged keys are dropped — the audit reports the
  * delta, and dropping them early keeps the output proportional to the
  * churn, not the store.
  *
  * One full-outer hash equi-join on the key, no window, no collect:
  * at 100 TB this is a single co-partitioned shuffle of the two
  * snapshots (bucketed snapshot layouts co-locate it entirely).
  */
object SnapshotDiff {

  def diff(
      before: DataFrame,
      after: DataFrame,
      keys: Seq[String],
      compareCols: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "snapshot diff needs at least one key column")
    val a = before.select((keys ++ compareCols).distinct.map(col): _*)
      .withColumn("__pa", lit(1)).alias("__a")
    val b = after.select((keys ++ compareCols).distinct.map(col): _*)
      .withColumn("__pb", lit(1)).alias("__b")
    def A(c: String): Column = col(s"__a.$c")
    def B(c: String): Column = col(s"__b.$c")
    val keyCond = keys.map(k => A(k) <=> B(k)).reduce(_ && _)
    // no compare columns = presence-only audit: ADDED/REMOVED still
    // report, nothing can be CHANGED
    val sameVals = compareCols.map(c => A(c) <=> B(c))
      .reduceOption(_ && _).getOrElse(lit(true))
    val change = when(A("__pa").isNull, "ADDED")
      .when(B("__pb").isNull, "REMOVED")
      .when(!sameVals, "CHANGED")
    a.join(b, keyCond, "full_outer")
      .withColumn("change", change)
      .filter(col("change").isNotNull) // unchanged -> dropped
      .select(
        keys.map(k => coalesce(A(k), B(k)).as(k)) ++
          Seq(col("change")) ++
          compareCols.flatMap(c => Seq(A(c).as(s"old_$c"), B(c).as(s"new_$c"))): _*)
  }
}
