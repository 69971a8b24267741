package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Leakage-safe categorical target encoding — the classical tabular
  * feature-engineering transform (Micci-Barreca 2001 smoothed mean
  * encoding) in its out-of-fold form: the encoding a row sees excludes
  * its own fold's contribution, so the feature never memorizes the
  * row's own label (the standard K-fold guard against target leakage,
  * the tabular sibling of the per-user [[graft.queries.HistoryQueries]]
  * group split).
  *
  * Determinism contract (cross-engine exact): `targetCol` must be
  * integral — sums are exact at any aggregation order — and the global
  * prior mean is ROUNDED to 6dp before it enters the smoothing
  * formula, so the final double expression folds identical operands in
  * a fixed order on both engines.
  */
object Encoding {

  /** Encoding table, one row per (category, fold):
    *
    *   enc(c, f) = (sum_c − sum_{c,f} + m · prior) / (n_c − n_{c,f} + m)
    *
    * where prior = round(Σ target / Σ n, 6) over the whole input and
    * `m` is the smoothing pseudo-count. A category seen ONLY in fold f
    * still gets a row (the prior, fully smoothed) — exactly what the
    * transform must emit for that fold's holdout rows.
    *
    * Shape at 100 TB: ONE map-side-combinable hash aggregation over
    * the data to the (category, fold) grain — category×fold-sized,
    * broadcastable — then all derivation (per-category totals, global
    * prior, the encoding arithmetic) happens on that tiny frame. The
    * fact table is scanned once; applying the encoding back to rows is
    * a broadcast join on (category, fold).
    */
  def targetEncodeOof(
      df: DataFrame,
      catCol: String,
      targetCol: String,
      foldCol: String,
      smoothing: Double = 10.0): DataFrame = {
    require(smoothing >= 0, s"smoothing must be >= 0, got $smoothing")
    // integral-target contract ENFORCED: cast("long") silently
    // truncates a double target (0.7 -> 0) and every encoding comes
    // out wrong with no error (review r6)
    locally {
      import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType, BooleanType}
      val t = df.schema(targetCol).dataType
      require(Seq(ByteType, ShortType, IntegerType, LongType, BooleanType).contains(t),
        s"targetEncodeOof needs an integral/boolean target (exact sums); " +
          s"'$targetCol' is $t — bin or round it explicitly first")
    }
    // the pair grain comes from the UNFILTERED frame: a (category,
    // fold) whose rows all carry null targets is still a real holdout
    // cell (its encoding derives from the OTHER folds) — pre-filtering
    // dropped its encoding-table row entirely and left those holdout
    // rows unencoded (review r11). Null targets contribute to neither
    // count nor sum.
    val cf = df
      .groupBy(col(catCol).as("category"), col(foldCol).as("fold"))
      .agg(count(col(targetCol)).as("__n_cf"),
        coalesce(sum(col(targetCol).cast("long")), lit(0L)).as("__s_cf"))

    // everything below operates on the category×fold-grain frame
    val totals = cf.groupBy("category")
      .agg(sum("__n_cf").as("__n_c"), sum("__s_cf").as("__s_c"))
    val prior = cf.agg(
      round(sum(col("__s_cf")).cast("double") / sum(col("__n_cf")), 6).as("__prior"))

    // smoothing = 0 and a category seen only in fold f make the
    // denominator 0: Spark's Divide yields NULL, IEEE engines yield
    // NaN — emit NULL explicitly so both agree on the undefined case
    val denom = (col("__n_c") - col("__n_cf")).cast("double") + lit(smoothing)
    // null-SAFE join: a null category is a real level (groupBy keeps
    // it) but the using-columns equi-join dropped its rows from the
    // encoding table, leaving null-category holdout rows unencoded
    // (review r6)
    cf.alias("__cf")
      .join(totals.alias("__t"), col("__cf.category") <=> col("__t.category"))
      .select(col("__cf.category").as("category"), col("__cf.fold").as("fold"),
        col("__cf.__n_cf").as("__n_cf"), col("__cf.__s_cf").as("__s_cf"),
        col("__t.__n_c").as("__n_c"), col("__t.__s_c").as("__s_c"))
      .crossJoin(broadcast(prior))
      .select(col("category"), col("fold"),
        (col("__n_c") - col("__n_cf")).as("n_holdout"),
        when(denom > 0, round(
          ((col("__s_c") - col("__s_cf")).cast("double") + lit(smoothing) * col("__prior")) /
            denom,
          6)).as("encoding"))
  }
}
