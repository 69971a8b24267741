package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Exact model/feature evaluation statistics — the metrics a training
  * pipeline computes over scored data BEFORE a model ships: ranking
  * quality (AUC), probability calibration, linear association
  * (Pearson), and categorical dependence (mutual information + χ²,
  * the feature-selection pair).
  *
  * Determinism contract (cross-engine exact, like
  * [[graft.functions.Drift]]): every statistic derives from integer
  * contingency/rank counts — exact at any aggregation order — or from
  * 6dp-ROUNDED double sums, through fixed-order final expressions.
  * ln/sqrt enter only after rounding-stable operands and are followed
  * by a 6dp output round, far above any libm last-ulp divergence.
  */
object Eval {

  /** Exact ROC AUC by the Mann–Whitney rank-sum identity with midrank
    * tie handling:
    *
    *   AUC = [ Σ_{s} pos(s) · (2·negBelow(s) + neg(s)) ] / (2·P·N)
    *
    * (each positive beats every lower-scored negative, half-beats each
    * tied negative; the numerator is kept ×2 so it stays an exact
    * BIGINT). Shape: one hash aggregation to the DISTINCT-SCORE grain,
    * then the shared DISTRIBUTED prefix sum
    * ([[graft.functions.Packing.withStartOffset]]): negBelow(s) is the
    * exclusive prefix of `__neg` in `__s` order. The slice id there is
    * a pure function of the score (driver-sampled bounds +
    * `SearchSorted`), NOT `spark_partition_id()` over a physical range
    * exchange — so deriving both the per-slice offsets and the
    * windowed prefix from the same frame is consistent by
    * construction, with no dependency on Spark physically reusing an
    * exchange (RangePartitioner samples with a per-execution seed;
    * two instantiations may pick different bounds). A continuous
    * score column whose distinct grain is near row-scale still never
    * funnels through one reducer. Null scores/labels are excluded.
    *
    * @return one row: (n_pos, n_neg, auc_num2, auc) — auc null when
    *         either class is empty (undefined, not 0).
    */
  def aucExact(df: DataFrame, scoreCol: Column, labelCol: Column): DataFrame = {
    val byScore = df
      .filter(scoreCol.isNotNull && labelCol.isNotNull)
      .select(scoreCol.as("__s"), labelCol.cast("boolean").as("__y"))
      .groupBy("__s")
      .agg(sum(col("__y").cast("long")).as("__pos"),
        sum((!col("__y")).cast("long")).as("__neg"))
    Packing.withStartOffset(byScore, "__s", "__neg", outCol = "__negBelow")
      .agg(sum("__pos").as("n_pos"), sum("__neg").as("n_neg"),
        sum(col("__pos") * (lit(2L) * col("__negBelow") + col("__neg")))
          .as("auc_num2"))
      // exact-BIGINT range guard (the systematicWeightedSample
      // policy): auc_num2's maximum is 2·n_pos·n_neg — past
      // Long.MaxValue that sum wraps silently under ANSI-off and an
      // AUC outside [0, 1] emerges with no error (ANSI-on throws an
      // opaque ARITHMETIC_OVERFLOW mid-aggregation). The division form
      // of the check cannot itself overflow.
      .select(col("n_pos"), col("n_neg"),
        when(col("n_neg") > 0L &&
            col("n_pos") > lit(Long.MaxValue / 2L) / col("n_neg"),
          raise_error(lit("aucExact: n_pos*n_neg exceeds the exact-BIGINT " +
            "pair range (~4.6e18) — sample the scores before exact AUC"))
            .cast("long"))
          .otherwise(col("auc_num2")).as("auc_num2"),
        when(col("n_pos") > 0 && col("n_neg") > 0,
          round(col("auc_num2").cast("double") /
            (lit(2.0) * col("n_pos") * col("n_neg")), 6)).as("auc"))
  }

  /** Reliability diagram: scores in [0,1] cut into `nBins` equal-width
    * bins (bin = min(floor(s·nBins), nBins−1) — integer-exact), per
    * bin the count, positive fraction, and mean score (6dp-rounded sum
    * over count — the [[graft.queries.HistoryQueries]] zscore
    * contract). One map-side-combinable aggregation; bins-sized
    * output. Calibration gap = frac_pos − mean_score per bin.
    */
  def calibrationBins(
      df: DataFrame,
      scoreCol: Column,
      labelCol: Column,
      nBins: Int = 10): DataFrame = {
    require(nBins > 0, s"nBins must be positive, got $nBins")
    // clamp BOTH ends: scores fractionally outside [0,1] (float
    // round-off from an upstream sigmoid) previously produced phantom
    // negative bin ids on the low side while the high side folded into
    // the top bin (review r6)
    val bin = greatest(
      least(floor(scoreCol * nBins).cast("long"), lit(nBins - 1L)), lit(0L))
    // a label that does not cast to boolean (e.g. 'pos'/'neg' strings)
    // silently nulled out of n_pos while still counted in n, deflating
    // frac_pos with no error — fail per-row instead (the Encoding r6
    // loud-cast policy). NaN scores are excluded like nulls: floor(NaN)
    // lands in bin 0 on Spark and diverges on other engines, and a
    // single NaN poisons the bin's mean_score.
    val yb = when(labelCol.isNotNull && labelCol.cast("boolean").isNull,
      raise_error(lit("calibrationBins: label value does not cast to " +
        "boolean — binarize the label explicitly first")).cast("boolean"))
      .otherwise(labelCol.cast("boolean"))
    df.filter(scoreCol.isNotNull && labelCol.isNotNull &&
        !isnan(scoreCol.cast("double")))
      .groupBy(bin.as("bin"))
      .agg(count(lit(1)).as("n"),
        sum(yb.cast("long")).as("n_pos"),
        round(sum(scoreCol), 6).as("__ss"))
      .select(col("bin"), col("n"), col("n_pos"),
        round(col("n_pos").cast("double") / col("n"), 6).as("frac_pos"),
        round(col("__ss") / col("n"), 6).as("mean_score"))
  }

  /** Pairwise Pearson correlation of numeric columns in ONE pass: all
    * per-column and per-pair sums fuse into a single aggregation over
    * a single scan (adding a column adds expressions, never a pass);
    * the correlations then derive on the 1-row frame from 6dp-rounded
    * sums via the standard n·Σxy formula. Rows with ANY null among
    * `cols` are excluded (pairwise-complete would make each pair see a
    * different n — listwise is the reproducible choice).
    *
    * @return long format: (col_a, col_b, n, corr) for a < b.
    */
  def pearsonMatrix(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.size >= 2, "pearsonMatrix needs at least two columns")
    require(cols.distinct.size == cols.size, s"duplicate columns in $cols")
    // internal aliases are INDEX-keyed: name-keyed __p_${a}_$b collided
    // for underscore-containing names ((a, b_c) vs (a_b, c) both made
    // __p_a_b_c → ambiguous-reference AnalysisException; review r6)
    val idx = cols.zipWithIndex.toMap
    val complete = df.filter(cols.map(c => col(c).isNotNull).reduce(_ && _))
    val pairIdx = cols.combinations(2).toSeq.map { case Seq(a, b) => (a, b) }
    val sums =
      Seq(count(lit(1)).as("__n")) ++
        cols.map(c => round(sum(col(c)), 6).as(s"__s_${idx(c)}")) ++
        cols.map(c => round(sum(col(c) * col(c)), 6).as(s"__q_${idx(c)}")) ++
        pairIdx.map { case (a, b) =>
          round(sum(col(a) * col(b)), 6).as(s"__p_${idx(a)}_${idx(b)}") }
    val wide = complete.agg(sums.head, sums.tail: _*)
    // ONE projection over the 1-row aggregate, unpivoted by explode —
    // per-pair selects unioned together would re-run the scan k·(k−1)/2
    // times whenever exchange reuse fails to kick in
    val pairStructs = pairIdx.map { case (a, b) =>
      val n = col("__n").cast("double")
      val cov = n * col(s"__p_${idx(a)}_${idx(b)}") - col(s"__s_${idx(a)}") * col(s"__s_${idx(b)}")
      val va = n * col(s"__q_${idx(a)}") - col(s"__s_${idx(a)}") * col(s"__s_${idx(a)}")
      val vb = n * col(s"__q_${idx(b)}") - col(s"__s_${idx(b)}") * col(s"__s_${idx(b)}")
      struct(lit(a).as("col_a"), lit(b).as("col_b"), col("__n").as("n"),
        when(va > 0 && vb > 0, round(cov / sqrt(va * vb), 6)).as("corr"))
    }
    wide.select(explode(array(pairStructs: _*)).as("__pair"))
      .select("__pair.*")
  }

  /** Mutual information (nats) and Pearson χ² between two categorical
    * columns, from one contingency aggregation:
    *
    *   MI = Σ_xy (n_xy/n) · ln(n_xy·n / (n_x·n_y)),
    *   χ² = Σ_xy (n_xy − e_xy)² / e_xy,  e_xy = n_x·n_y/n
    *
    * χ² ranges over the FULL x×y grid (absent cells contribute e_xy);
    * MI's absent cells contribute 0 by the 0·ln0 convention, so the
    * observed cells suffice for both: the grid term Σe over ALL cells
    * is n by construction, giving Σ(n_xy−e)²/e = Σ_obs n_xy²/e − n
    * without materializing the spine. Both statistics are fixed-order
    * expressions over integer counts (marginals re-aggregate from the
    * contingency frame — cell-count-sized, not data-sized). Null
    * categories are their own level (like [[Drift.categoricalPsi]]),
    * REPRESENTED by the "<null>" sentinel — a column that also carries
    * the literal string "<null>" (CSV/JSON-laundered data) has those
    * two levels MERGED into one cell; pre-map such values if the
    * distinction matters.
    *
    * @return one row: (n, n_cells, mi, chi2)
    */
  def mutualInfoChi2(df: DataFrame, xCol: Column, yCol: Column): DataFrame = {
    val cells = df
      .select(coalesce(xCol.cast("string"), lit("<null>")).as("__x"),
        coalesce(yCol.cast("string"), lit("<null>")).as("__y"))
      .groupBy("__x", "__y").agg(count(lit(1)).as("__nxy"))
    val xm = cells.groupBy("__x").agg(sum("__nxy").as("__nx"))
    val ym = cells.groupBy("__y").agg(sum("__nxy").as("__ny"))
    val tot = cells.agg(sum("__nxy").as("__n"))
    val j = cells.join(xm, "__x").join(ym, "__y").crossJoin(broadcast(tot))
    val n = col("__n").cast("double")
    // all-double products: BIGINT·BIGINT would overflow at corpus scale
    // and would diverge from the oracle's double arithmetic
    val miTerm = (col("__nxy").cast("double") / col("__n")) *
      log(col("__nxy").cast("double") * col("__n") /
        (col("__nx").cast("double") * col("__ny")))
    val chiTerm = col("__nxy").cast("double") * col("__nxy") * n /
      (col("__nx").cast("double") * col("__ny"))
    j.agg(max(col("__n")).as("n"), count(lit(1)).as("n_cells"),
      round(sum(miTerm), 6).as("mi"),
      round(sum(chiTerm) - max(col("__n")), 6).as("chi2"))
  }
}
