package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Golden-record survivorship: collapse each key's row history to one
  * record where EVERY value column independently takes its most recent
  * NON-NULL value — the MDM / entity-consolidation merge rule
  * ("latest non-null per field"), and the per-FIELD generalization of
  * [[PullLatest]]'s per-row latest (a row-level latest forgets a field
  * the newest row happens to miss; survivorship keeps the last row
  * that DID carry it).
  *
  * Implementation: one hash aggregation — per value column,
  * max(struct(orderCols…, value)) over only the rows where the value
  * is non-null (lexicographic struct max = argmax by the order key;
  * the order columns must totally order rows per key, e.g.
  * (event time, unique id), making the pick deterministic). Map-side
  * combinable, never a window sort; at 100 TB this is one shuffle of
  * partially-aggregated key-grained state, the same shape as
  * [[PullLatest]].
  */
object Survivorship {

  /** @param orderCols columns whose lexicographic order ranks recency;
    *                   must be non-null and unique per key (e.g. ts +
    *                   a unique id tiebreak)
    * @param valueCols columns to survive independently
    * @return one row per key: keys ++ valueCols (latest non-null each)
    *         ++ n_rows ++ `<orderHead>_latest` (the newest order value
    *         over ALL rows, null-or-not — the record's freshness mark)
    */
  def goldenRecord(
      df: DataFrame,
      keys: Seq[String],
      orderCols: Seq[String],
      valueCols: Seq[String]): DataFrame = {
    require(keys.nonEmpty && orderCols.nonEmpty && valueCols.nonEmpty,
      "goldenRecord needs keys, orderCols and valueCols")
    val rank: Seq[Column] = orderCols.map(col)
    val picks: Seq[Column] = valueCols.map { v =>
      max(when(col(v).isNotNull, struct(rank :+ col(v).as("__v"): _*)))
        .getField("__v").as(v)
    }
    val extras: Seq[Column] = Seq(
      count(lit(1)).as("n_rows"),
      max(col(orderCols.head)).as(s"${orderCols.head}_latest"))
    df.groupBy(keys.map(col): _*)
      .agg(picks.head, (picks.tail ++ extras): _*)
  }
}
