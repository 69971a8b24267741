package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.functions._

/** Latest-per-key snapshot (O3), the materialization scan:
  * filter event_ts in [start, end] (inclusive BETWEEN — the reference's
  * SQL-store semantics, bigquery.py:61-96; the file store's exclusive
  * upper bound at file.py:259-262 is a documented reference
  * inconsistency we resolve in favor of BETWEEN), then keep the newest
  * row per entity-key combination ordered by
  * (event_ts DESC, created_ts DESC, tieBreaks DESC).
  *
  * Implementation: groupBy(keys).agg(max_by(payload, orderKey)) — a
  * declarative aggregate with map-side partial aggregation, so each
  * map task pre-collapses its rows to one candidate per key before the
  * shuffle. The reference's ROW_NUMBER() window formulation shuffles
  * every input row; at 100 TB that is the difference between shuffling
  * |keys| rows and shuffling |input| rows.
  */
object PullLatest {

  def pullLatest(
      df: DataFrame,
      joinKeys: Seq[String],
      tsCol: String,
      createdCol: Option[String],
      featureCols: Seq[String],
      start: Timestamp,
      end: Timestamp,
      tieBreakCols: Seq[String] = Nil): DataFrame = {

    val filtered = df.filter(col(tsCol) >= lit(start) && col(tsCol) <= lit(end))
    latestPerKey(filtered, joinKeys, tsCol, createdCol, featureCols, tieBreakCols)
  }

  /** The materialization window WITHOUT the reduction: the ts BETWEEN
    * filter and column projection only. For stores whose upsert is
    * itself a map-side-combinable latest-per-key aggregation
    * ([[graft.online.OnlineStore.wantsPreReduced]] = false) — running
    * the full pullLatest first would add a second exchange carrying
    * the same key-grain rows. */
  def windowOnly(
      df: DataFrame,
      joinKeys: Seq[String],
      tsCol: String,
      createdCol: Option[String],
      featureCols: Seq[String],
      start: Timestamp,
      end: Timestamp): DataFrame = {
    val cols = (joinKeys ++ Seq(tsCol) ++ createdCol.toSeq ++ featureCols).distinct
    df.filter(col(tsCol) >= lit(start) && col(tsCol) <= lit(end))
      .select(cols.map(col): _*)
  }

  /** THE latest-per-key total order, shared by every LWW site (this
    * operator, the parquet store's one-exchange upsert merge, the CDC
    * stream's net-change collapse): winners order by
    * (ts, created?, tieBreaks?, payload) with the feature payload
    * appended as a stable final tiebreak — exact (ts, created)
    * duplicates resolve to the max payload instead of the reference's
    * nondeterministic ANY_VALUE (bigquery.py:645-660). One definition
    * so the contract cannot silently diverge between the batch path
    * and the store/stream paths.
    *
    * @return (payload struct, order-key struct, payload column names)
    */
  def lwwKeys(
      tsCol: String,
      createdCol: Option[String],
      featureCols: Seq[String],
      tieBreakCols: Seq[String] = Nil): (Column, Column, Seq[String]) = {
    val ordCols: Seq[String] = ((tsCol +: createdCol.toSeq) ++ tieBreakCols).distinct
    val payloadCols: Seq[String] = (ordCols ++ featureCols).distinct
    val payload: Column = struct(payloadCols.map(col): _*)
    val ordKey: Column = struct((ordCols.map(col) :+ payload.as("__payload")): _*)
    (payload, ordKey, payloadCols)
  }

  /** Newest row per key without the range filter (used by streaming
    * micro-batches and online reads over a batch-serving table). */
  def latestPerKey(
      df: DataFrame,
      joinKeys: Seq[String],
      tsCol: String,
      createdCol: Option[String],
      featureCols: Seq[String],
      tieBreakCols: Seq[String] = Nil): DataFrame = {
    val (payload, ordKey, payloadCols) =
      lwwKeys(tsCol, createdCol, featureCols, tieBreakCols)
    df.groupBy(joinKeys.map(col): _*)
      .agg(max_by(payload, ordKey).as("__w"))
      .select((joinKeys.map(col) ++ payloadCols.map(c => col(s"__w.$c").as(c))): _*)
  }
}
