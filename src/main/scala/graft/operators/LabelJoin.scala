package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Forward as-of (label) join — the time-reversed dual of
  * [[PointInTimeJoin]]: for each entity row, attach the EARLIEST
  * feature/outcome row with `event_ts` strictly AFTER the entity
  * timestamp and within `horizon`. This is the label-construction step
  * of a training pipeline ("the outcome observed after the prediction
  * point"), with the strict lower edge as the leakage guard: a row AT
  * the prediction instant is a feature, not a label (the reference's
  * backward join is inclusive for exactly the symmetric reason,
  * bigquery.py:613-617).
  *
  * Same scale shape as the backward join: narrow candidate projection,
  * equi join on keys + range predicate, then a min_by partial
  * aggregation per entity row — map-side combinable, no window, so a
  * hot key collapses per map task before the shuffle. The label scan is
  * bounded by [min(entity_ts), max(entity_ts) + horizon] literals,
  * pushed to parquet row-group skipping.
  */
object LabelJoin {

  /** @param entityDf   rows to label; must contain `joinKeys` and `entityTsCol`
    * @param labelDf    outcome source; must contain `joinKeys`, `labelTsCol`, `labelCols`
    * @param horizon    max lookahead; the label must satisfy
    *                   entity_ts < label_ts <= entity_ts + horizon
    * @param tieBreaks  extra ascending order columns after label_ts (a
    *                   total order makes the winner deterministic when
    *                   two outcomes share a timestamp) */
  def join(
      entityDf: DataFrame,
      labelDf: DataFrame,
      joinKeys: Seq[String],
      labelCols: Seq[String],
      horizon: java.time.Duration,
      entityTsCol: String = PointInTimeJoin.DefaultEntityTsCol,
      labelTsCol: String = "event_timestamp",
      tieBreaks: Seq[String] = Nil): DataFrame = {
    require(!horizon.isNegative && !horizon.isZero, "horizon must be positive")
    require(joinKeys.nonEmpty,
      "joinKeys must be non-empty (a global un-keyed label join would " +
        "cross-join the label table against every entity row — add a " +
        "constant key column deliberately if that is really intended)")
    // the winners join back by name: a pre-existing output column would
    // silently duplicate in the joined frame and break any later select
    val outClash = (labelCols :+ "label_ts").intersect(entityDf.columns)
    require(outClash.isEmpty,
      s"entity df already has output column(s) ${outClash.mkString(", ")} — " +
        "rename or drop them before the label join")
    val rowId = "__graft_row_id"
    val stampedRaw = entityDf.withColumn(rowId, monotonically_increasing_id())
    val stamped =
      if (PointInTimeJoin.needsRowIdPinning(entityDf)) stampedRaw.localCheckpoint()
      else stampedRaw

    // Scan bounds, computed once (the forward mirror of the backward
    // join's O5 pruning): labels live in (min_ts, max_ts + horizon].
    // Shared with the PIT join: metadata-only from parquet footers when
    // the entity plan allows (zero Spark jobs), else the tiny agg — a
    // footer SUPERSET of the true bounds only widens the label window,
    // never drops a match.
    val (mnTs, mxTs) = PointInTimeJoin.entityBounds(stamped, entityTsCol)

    val left = stamped
      .select((rowId +: entityTsCol +: joinKeys).distinct.map(col): _*).alias("__l")
    def L(c: String): Column = col(s"__l.$c")
    def R(c: String): Column = col(s"__r.$c")

    val ordCols = (labelTsCol +: tieBreaks).distinct
    var lab = labelDf.select((joinKeys ++ ordCols ++ labelCols).distinct.map(col): _*)
    if (mnTs != null) lab = lab.filter(col(labelTsCol) > lit(mnTs))
    if (mxTs != null) lab = lab.filter(col(labelTsCol) <=
      lit(java.sql.Timestamp.from(mxTs.toInstant.plus(horizon))))
    val labAliased = lab.alias("__r")

    val horizonInterval = PointInTimeJoin.durationInterval(horizon)
    val window: Column = R(labelTsCol) > L(entityTsCol) &&
      R(labelTsCol) <= L(entityTsCol) + horizonInterval
    val keyCond = joinKeys.map(k => L(k) <=> R(k)).reduce(_ && _)
    val candidates = left.join(labAliased, keyCond && window, "inner")

    // Earliest-outcome winner per entity row: min_by over (label_ts,
    // tiebreaks, payload) — the payload tail pins determinism even
    // without user tiebreaks, mirroring the backward join's max_by.
    val payload = struct((labelCols.map(R) :+ R(labelTsCol).as("__label_ts")): _*)
    val ordKey = struct((ordCols.map(R) :+ payload.as("__payload")): _*)
    val winners = candidates
      .groupBy(L(rowId).as(rowId))
      .agg(min_by(payload, ordKey).as("__win"))
      .select(col(rowId) +:
        labelCols.map(f => col(s"__win.$f").as(f)) :+
        col("__win.__label_ts").as("label_ts"): _*)

    stamped.join(winners, Seq(rowId), "left").drop(rowId)
  }
}
