package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-log history operators: SCD-2 validity-interval construction
  * and gap-based sessionization. Both are the per-key sequential duals
  * of the engine's as-of joins — where [[PointInTimeJoin]] ASKS "what
  * was true at time t", these BUILD the versioned/sessionized form of
  * the log that such questions read from (the offline store's
  * time-travel table; the reference serves the same need by retaining
  * the raw event log and re-running the as-of scan per query —
  * file.py:86-213).
  *
  * Scale shape: both are window functions partitioned by the entity
  * key. Per-key history is the irreducible unit of work — interval
  * edges and session cuts are defined by a key's NEIGHBORING events, so
  * any engine must co-locate and order each key's events once (the
  * reference's pandas path sorts the whole frame per query,
  * file.py:102-105). One shuffle on the key, group size bounded by
  * per-key event count, never corpus size. A pathologically hot key
  * (one user = billions of events) is the one skew case; the mitigation
  * is upstream per-key quota capping ([[graft.functions.Quota]]), not a
  * different plan.
  */
object History {

  /** SCD-2 (slowly-changing-dimension type 2) history: collapse an
    * event log (key, ts, attrs…) into one row per VERSION — consecutive
    * runs of identical attribute values — with `[valid_from, valid_to)`
    * bounds; the current version has valid_to null. A no-op update
    * (same attrs as the previous event) extends the open interval
    * instead of opening a new one.
    *
    * Ordering within a key is (tsCol, tieBreaks…): pass a unique
    * tie-break column for a total order under duplicate timestamps.
    *
    * @return keys ++ attrs ++ (valid_from, valid_to, version) — version
    *         is 1-based per key in interval order.
    */
  def scd2(
      df: DataFrame,
      keys: Seq[String],
      tsCol: String,
      attrs: Seq[String],
      tieBreaks: Seq[String] = Nil): DataFrame = {
    require(attrs.nonEmpty, "scd2 needs at least one tracked attribute")
    require(!df.columns.contains("__chg"),
      "input column '__chg' collides with scd2's internal change flag — " +
        "rename it first (it would be silently replaced and dropped)")
    val ord: Seq[Column] = (tsCol +: tieBreaks).map(col)
    val w = Window.partitionBy(keys.map(col): _*).orderBy(ord: _*)
    // change flag: any tracked attr differs null-safely from the
    // previous event. ONE predicate covers the first row of each key
    // too: attrStruct is a struct constructor (never null), so
    // lag=null <=> struct is false and the negation opens the version —
    // the oracle's single IS DISTINCT FROM formulation.
    val attrStruct = struct(attrs.map(col): _*)
    val changed = !(lag(attrStruct, 1).over(w) <=> attrStruct)
    val opened = df
      .withColumn("__chg", changed)
      .filter(col("__chg"))
      .drop("__chg")
    // valid_to = next version's open ts (over the SURVIVING rows only)
    val w2 = Window.partitionBy(keys.map(col): _*).orderBy(ord: _*)
    opened
      .withColumn("valid_from", col(tsCol))
      .withColumn("valid_to", lead(col(tsCol), 1).over(w2))
      .withColumn("version", row_number().over(w2).cast("long"))
      .select((keys.map(col) ++ attrs.map(col) ++
        Seq(col("valid_from"), col("valid_to"), col("version"))): _*)
  }

  /** Gap-based sessionization: split each key's event sequence into
    * sessions wherever the gap to the previous event exceeds
    * `gapSeconds`, and aggregate one row per session. The classic
    * batch form of the streaming session window
    * ([[graft.streaming]] q_stream_sessionize is the
    * mapGroupsWithState dual): session id = running count of
    * gap-exceeded flags — one pass, two windows over the same key
    * partition (Catalyst evaluates them in a single Window operator
    * chain after one shuffle on the key).
    *
    * @param aggs session aggregates over the event columns, e.g.
    *             count(*), sum(value) — applied per (keys, session_idx)
    * @return keys ++ (session_idx, session_start, session_end,
    *         n_events) ++ aggs
    */
  def sessionize(
      df: DataFrame,
      keys: Seq[String],
      tsCol: String,
      gapSeconds: Long,
      tieBreaks: Seq[String] = Nil,
      aggs: Seq[Column] = Nil): DataFrame = {
    require(gapSeconds > 0, s"gapSeconds must be positive, got $gapSeconds")
    // session_idx is an OUTPUT column; a pre-existing one (e.g. the
    // result of a prior sessionize joined back to events) would be
    // silently replaced, and __cut is an internal working name
    val clash = df.columns.filter(c => c == "__cut" || c == "session_idx")
    require(clash.isEmpty,
      s"input column(s) ${clash.mkString(", ")} collide with sessionize's " +
        "output/working names — rename them first")
    val ord: Seq[Column] = (tsCol +: tieBreaks).map(col)
    val w = Window.partitionBy(keys.map(col): _*).orderBy(ord: _*)
    val prevTs = lag(col(tsCol), 1).over(w)
    val isCut = prevTs.isNull ||
      (unix_micros(col(tsCol)) - unix_micros(prevTs)) > gapSeconds * 1000000L
    val sessions = df
      .withColumn("__cut", isCut.cast("long"))
      .withColumn("session_idx",
        sum(col("__cut")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
    val baseAggs = Seq(
      min(col(tsCol)).as("session_start"),
      max(col(tsCol)).as("session_end"),
      count(lit(1)).as("n_events"))
    sessions
      .groupBy((keys.map(col) :+ col("session_idx")): _*)
      .agg(baseAggs.head, (baseAggs.tail ++ aggs): _*)
  }
}
