package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Nearest as-of join — the third direction of the as-of family next
  * to the backward [[PointInTimeJoin]] and the forward [[LabelJoin]]:
  * for each entity row, attach the feature row with the SMALLEST
  * absolute timestamp distance within a symmetric `tolerance`
  * (pandas `merge_asof(direction="nearest")`). Ties at equal distance
  * resolve BACKWARD (the row at or before the anchor wins — the
  * leakage-conservative choice), then by `tieBreaks`.
  *
  * Same scale shape as its two siblings: the feature scan is bounded
  * by [min(entity_ts) − tolerance, max(entity_ts) + tolerance]
  * literals (pushed to parquet), candidates come from one equi join on
  * the keys plus the range predicate, and the winner per entity row is
  * a min_by partial aggregation — map-side combinable, no window, no
  * sort of the feature table.
  */
object NearestJoin {

  def join(
      entityDf: DataFrame,
      featureDf: DataFrame,
      joinKeys: Seq[String],
      featureCols: Seq[String],
      tolerance: java.time.Duration,
      entityTsCol: String = PointInTimeJoin.DefaultEntityTsCol,
      featureTsCol: String = "event_timestamp",
      tieBreaks: Seq[String] = Nil): DataFrame = {
    require(!tolerance.isNegative && !tolerance.isZero, "tolerance must be positive")
    require(joinKeys.nonEmpty,
      "joinKeys must be non-empty (an un-keyed nearest join would " +
        "cross-join the feature table against every entity row)")
    val outClash = (featureCols :+ "matched_ts").intersect(entityDf.columns)
    require(outClash.isEmpty,
      s"entity df already has output column(s) ${outClash.mkString(", ")} — " +
        "rename or drop them before the nearest join")
    val rowId = "__graft_row_id"
    val stampedRaw = entityDf.withColumn(rowId, monotonically_increasing_id())
    val stamped =
      if (PointInTimeJoin.needsRowIdPinning(entityDf)) stampedRaw.localCheckpoint()
      else stampedRaw

    // shared zero-job footer-bounds path (agg fallback) — a footer
    // SUPERSET of the true bounds only widens the ±tolerance window
    val (mnTs, mxTs) = PointInTimeJoin.entityBounds(stamped, entityTsCol)

    val left = stamped
      .select((rowId +: entityTsCol +: joinKeys).distinct.map(col): _*).alias("__l")
    def L(c: String): Column = col(s"__l.$c")
    def R(c: String): Column = col(s"__r.$c")

    val ordCols = (featureTsCol +: tieBreaks).distinct
    var feat = featureDf.select((joinKeys ++ ordCols ++ featureCols).distinct.map(col): _*)
    if (mnTs != null) feat = feat.filter(col(featureTsCol) >=
      lit(java.sql.Timestamp.from(mnTs.toInstant.minus(tolerance))))
    if (mxTs != null) feat = feat.filter(col(featureTsCol) <=
      lit(java.sql.Timestamp.from(mxTs.toInstant.plus(tolerance))))
    val featAliased = feat.alias("__r")

    val tolInterval = PointInTimeJoin.durationInterval(tolerance)
    val window: Column =
      R(featureTsCol) >= L(entityTsCol) - tolInterval &&
        R(featureTsCol) <= L(entityTsCol) + tolInterval
    val keyCond = joinKeys.map(k => L(k) <=> R(k)).reduce(_ && _)
    val candidates = left.join(featAliased, keyCond && window, "inner")

    // winner order: distance, then direction (backward first), then the
    // user tiebreaks, then the payload tail that pins determinism
    val absDiff = abs(unix_micros(R(featureTsCol)) - unix_micros(L(entityTsCol)))
    val dirFlag = when(R(featureTsCol) <= L(entityTsCol), 0).otherwise(1)
    val payload = struct((featureCols.map(R) :+ R(featureTsCol).as("__matched_ts")): _*)
    val ordKey = struct(
      absDiff +: dirFlag +: ordCols.map(R) :+ payload.as("__payload"): _*)
    val winners = candidates
      .groupBy(L(rowId).as(rowId))
      .agg(min_by(payload, ordKey).as("__win"))
      .select(col(rowId) +:
        featureCols.map(f => col(s"__win.$f").as(f)) :+
        col("__win.__matched_ts").as("matched_ts"): _*)

    stamped.join(winners, Seq(rowId), "left").drop(rowId)
  }
}
