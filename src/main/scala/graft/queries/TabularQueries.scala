package graft.queries

import java.time.Duration

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Event-analytics + tabular-ML feature queries (round 8): funnel
  * conversion, cohort retention, out-of-fold target encoding,
  * golden-record survivorship, inter-annotator agreement. Same oracle
  * conventions as CoreQueries: integer counts everywhere a sum crosses
  * engines, fixed-order double expressions over exact operands, 6dp
  * rounding at the output boundary only, unique-key final sort.
  */
object TabularQueries {

  private def ev(s: SparkSession, dir: String): DataFrame =
    graft.sources.Tables.read(s, dir, "events")
  private def docs(s: SparkSession, dir: String): DataFrame =
    graft.sources.Tables.read(s, dir, "documents")

  // ---- funnel conversion ----------------------------------------------

  private val FunnelSteps = Seq("signup", "view", "click", "purchase")
  private val FunnelGapDays = 7L

  /** Strict-order signup→view→click→purchase funnel with a 7-day
    * max gap per step ([[graft.operators.Funnel.funnel]]): per-step
    * converted-user counts and conversion vs step 1. */
  def funnel(s: SparkSession, dir: String): DataFrame =
    graft.operators.Funnel.funnel(ev(s, dir), "user_id", "ts", "event_type",
      FunnelSteps, Some(Duration.ofDays(FunnelGapDays)))

  val funnelSql: String = {
    val gapUs = FunnelGapDays * 86400L * 1000000L
    s"""WITH s1 AS (
       |  SELECT user_id, min(ts) AS t FROM events
       |  WHERE event_type = 'signup' GROUP BY 1),
       |s2 AS (
       |  SELECT e.user_id, min(e.ts) AS t FROM events e JOIN s1 USING (user_id)
       |  WHERE e.event_type = 'view' AND e.ts > s1.t
       |    AND epoch_us(e.ts) <= epoch_us(s1.t) + $gapUs GROUP BY 1),
       |s3 AS (
       |  SELECT e.user_id, min(e.ts) AS t FROM events e JOIN s2 USING (user_id)
       |  WHERE e.event_type = 'click' AND e.ts > s2.t
       |    AND epoch_us(e.ts) <= epoch_us(s2.t) + $gapUs GROUP BY 1),
       |s4 AS (
       |  SELECT e.user_id, min(e.ts) AS t FROM events e JOIN s3 USING (user_id)
       |  WHERE e.event_type = 'purchase' AND e.ts > s3.t
       |    AND epoch_us(e.ts) <= epoch_us(s3.t) + $gapUs GROUP BY 1),
       |n AS (
       |  SELECT 1 AS step, 'signup' AS step_name, (SELECT count(*) FROM s1) AS n_users
       |  UNION ALL SELECT 2, 'view', (SELECT count(*) FROM s2)
       |  UNION ALL SELECT 3, 'click', (SELECT count(*) FROM s3)
       |  UNION ALL SELECT 4, 'purchase', (SELECT count(*) FROM s4))
       |SELECT step, step_name, n_users,
       |       CASE WHEN (SELECT n_users FROM n WHERE step = 1) > 0
       |            THEN round(CAST(n_users AS DOUBLE)
       |                       / (SELECT n_users FROM n WHERE step = 1), 6)
       |       END AS pct_of_first
       |FROM n ORDER BY step""".stripMargin
  }

  // ---- cohort retention -----------------------------------------------

  private val RetentionOriginUs = 1704067200000000L // 2024-01-01 00:00:00 UTC
  private val RetentionPeriodDays = 7

  /** Weekly cohort retention over the event log
    * ([[graft.operators.Funnel.retention]]): cohort = first-event week
    * since Jan 1, activity = distinct user-weeks. */
  def retention(s: SparkSession, dir: String): DataFrame =
    graft.operators.Funnel.retention(ev(s, dir), "user_id", "ts",
      RetentionOriginUs, RetentionPeriodDays)

  val retentionSql: String = {
    val periodUs = RetentionPeriodDays * 86400L * 1000000L
    s"""WITH wp AS (
       |  SELECT user_id AS u,
       |         ((epoch_us(ts) - $RetentionOriginUs)
       |          - (((epoch_us(ts) - $RetentionOriginUs) % $periodUs
       |              + $periodUs) % $periodUs)) // $periodUs AS p
       |  FROM events),
       |coh AS (SELECT u, min(p) AS c FROM wp GROUP BY 1),
       |act AS (SELECT DISTINCT u, p FROM wp),
       |j AS (
       |  SELECT coh.c, act.p - coh.c AS off, count(*) AS n_active
       |  FROM act JOIN coh USING (u) GROUP BY 1, 2),
       |sz AS (SELECT c, count(*) AS n_cohort FROM coh GROUP BY 1)
       |SELECT j.c AS cohort_period, j.off AS period_offset, j.n_active,
       |       sz.n_cohort,
       |       round(CAST(j.n_active AS DOUBLE) / sz.n_cohort, 6) AS retention
       |FROM j JOIN sz USING (c)
       |ORDER BY cohort_period, period_offset""".stripMargin
  }

  // ---- out-of-fold target encoding ------------------------------------

  private val TeSmoothing = 10.0

  /** Smoothed out-of-fold target encoding of event_type against the
    * integer-bucketed value (floor — exact on both engines), folds =
    * user_id % 5 ([[graft.functions.Encoding.targetEncodeOof]]). */
  def targetEncode(s: SparkSession, dir: String): DataFrame =
    graft.functions.Encoding.targetEncodeOof(
      ev(s, dir)
        .filter(col("value").isNotNull)
        .select(col("event_type"), (col("user_id") % 5).as("fold"),
          floor(col("value")).as("t")),
      "event_type", "t", "fold", TeSmoothing)
      .orderBy("category", "fold")

  val targetEncodeSql: String =
    s"""WITH base AS (
       |  SELECT event_type AS category, user_id % 5 AS fold,
       |         CASE WHEN value IS NOT NULL
       |              THEN CAST(floor(value) AS BIGINT) END AS t
       |  FROM events),
       |cf AS (
       |  SELECT category, fold, count(t) AS n_cf,
       |         coalesce(sum(t), 0) AS s_cf
       |  FROM base GROUP BY 1, 2),
       |tot AS (SELECT category, CAST(sum(n_cf) AS BIGINT) AS n_c,
       |               CAST(sum(s_cf) AS BIGINT) AS s_c
       |        FROM cf GROUP BY 1),
       |pr AS (SELECT round(CAST(sum(s_cf) AS DOUBLE) / sum(n_cf), 6) AS prior
       |       FROM cf)
       |SELECT cf.category, cf.fold, tot.n_c - cf.n_cf AS n_holdout,
       |       CASE WHEN CAST(tot.n_c - cf.n_cf AS DOUBLE) + $TeSmoothing > 0 THEN
       |         round((CAST(tot.s_c - cf.s_cf AS DOUBLE) + $TeSmoothing * pr.prior)
       |               / (CAST(tot.n_c - cf.n_cf AS DOUBLE) + $TeSmoothing), 6)
       |       END AS encoding
       |FROM cf JOIN tot ON cf.category IS NOT DISTINCT FROM tot.category
       |CROSS JOIN pr
       |ORDER BY cf.category, cf.fold""".stripMargin

  // ---- golden-record survivorship -------------------------------------

  /** Golden record per user ([[graft.operators.Survivorship]]): 'error'
    * events carry no trusted reading (value nulled — the sensor-failure
    * modality), so the golden value is the latest NON-error reading
    * while last_event_type tracks the latest row of any kind; a
    * row-level latest would null the value whenever the newest event
    * happens to be an error. */
  def goldenRecord(s: SparkSession, dir: String): DataFrame = {
    val e = ev(s, dir).filter(col("ts").isNotNull)
      .select(col("user_id"), unix_micros(col("ts")).as("__us"),
        col("event_id"), col("event_type"),
        when(col("event_type") =!= "error", col("value")).as("v"))
    graft.operators.Survivorship.goldenRecord(e, Seq("user_id"),
        Seq("__us", "event_id"), Seq("event_type", "v"))
      .select(col("user_id"), col("event_type").as("last_event_type"),
        round(col("v"), 6).as("last_good_value"), col("n_rows"),
        expr("__us_latest div 1000").as("last_ts_ms"))
      .orderBy("user_id")
  }

  val goldenRecordSql: String =
    """WITH t AS (
      |  SELECT user_id, epoch_us(ts) AS us, event_id, event_type,
      |         CASE WHEN event_type <> 'error' THEN value END AS v
      |  FROM events WHERE ts IS NOT NULL),
      |et AS (
      |  SELECT user_id, event_type FROM (
      |    SELECT user_id, event_type,
      |           ROW_NUMBER() OVER (PARTITION BY user_id
      |                              ORDER BY us DESC, event_id DESC) AS rn
      |    FROM t WHERE event_type IS NOT NULL) WHERE rn = 1),
      |vv AS (
      |  SELECT user_id, v FROM (
      |    SELECT user_id, v,
      |           ROW_NUMBER() OVER (PARTITION BY user_id
      |                              ORDER BY us DESC, event_id DESC) AS rn
      |    FROM t WHERE v IS NOT NULL) WHERE rn = 1),
      |base AS (SELECT user_id, count(*) AS n_rows, max(us) AS mx
      |         FROM t GROUP BY 1)
      |SELECT b.user_id, et.event_type AS last_event_type,
      |       round(vv.v, 6) AS last_good_value, b.n_rows,
      |       b.mx // 1000 AS last_ts_ms
      |FROM base b LEFT JOIN et USING (user_id) LEFT JOIN vv USING (user_id)
      |ORDER BY user_id""".stripMargin

  // ---- inter-annotator agreement --------------------------------------

  /** Cohen's kappa between two deterministic document annotators
    * (long-by-chars: n_chars ≥ 300; long-by-words: whitespace word
    * count ≥ 50) — correlated but not identical raters, so chance
    * agreement is high and kappa scores the surplus
    * ([[graft.functions.Validate.cohenKappa]]). */
  def kappa(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    val words = length(col("text")) - length(regexp_replace(col("text"), " ", "")) + 1
    graft.functions.Validate.cohenKappa(d, col("n_chars") >= 300, words >= 50)
  }

  val kappaSql: String =
    """WITH flags AS (
      |  SELECT n_chars >= 300 AS a,
      |         (length(text) - length(replace(text, ' ', '')) + 1) >= 50 AS b
      |  FROM documents),
      |c AS (
      |  SELECT count(*) AS n,
      |    CAST(sum(CASE WHEN a AND b THEN 1 ELSE 0 END) AS BIGINT) AS n_both,
      |    CAST(sum(CASE WHEN a AND NOT b THEN 1 ELSE 0 END) AS BIGINT) AS n_only_a,
      |    CAST(sum(CASE WHEN NOT a AND b THEN 1 ELSE 0 END) AS BIGINT) AS n_only_b,
      |    CAST(sum(CASE WHEN NOT a AND NOT b THEN 1 ELSE 0 END) AS BIGINT) AS n_neither
      |  FROM flags WHERE a IS NOT NULL AND b IS NOT NULL)
      |SELECT n, n_both, n_only_a, n_only_b, n_neither,
      |  round(CAST(n_both + n_neither AS DOUBLE) / n, 6) AS po,
      |  round((CAST(n_both + n_only_a AS DOUBLE) / n)
      |          * (CAST(n_both + n_only_b AS DOUBLE) / n)
      |        + (1 - CAST(n_both + n_only_a AS DOUBLE) / n)
      |          * (1 - CAST(n_both + n_only_b AS DOUBLE) / n), 6) AS pe,
      |  CASE WHEN (CAST(n_both + n_only_a AS DOUBLE) / n)
      |              * (CAST(n_both + n_only_b AS DOUBLE) / n)
      |            + (1 - CAST(n_both + n_only_a AS DOUBLE) / n)
      |              * (1 - CAST(n_both + n_only_b AS DOUBLE) / n) < 1
      |       THEN round((CAST(n_both + n_neither AS DOUBLE) / n
      |                   - ((CAST(n_both + n_only_a AS DOUBLE) / n)
      |                        * (CAST(n_both + n_only_b AS DOUBLE) / n)
      |                      + (1 - CAST(n_both + n_only_a AS DOUBLE) / n)
      |                        * (1 - CAST(n_both + n_only_b AS DOUBLE) / n)))
      |                  / (1 - ((CAST(n_both + n_only_a AS DOUBLE) / n)
      |                            * (CAST(n_both + n_only_b AS DOUBLE) / n)
      |                          + (1 - CAST(n_both + n_only_a AS DOUBLE) / n)
      |                            * (1 - CAST(n_both + n_only_b AS DOUBLE) / n))), 6)
      |  END AS kappa
      |FROM c""".stripMargin

  // ---- exact AUC ------------------------------------------------------

  /** Exact ROC AUC of the value column as a score for "is this a
    * purchase" ([[graft.functions.Eval.aucExact]]): the Mann–Whitney
    * rank-sum identity with midrank ties, numerator kept ×2 in BIGINT
    * so both engines compare exact integers. */
  def auc(s: SparkSession, dir: String): DataFrame =
    graft.functions.Eval.aucExact(ev(s, dir),
      col("value"), col("event_type") === "purchase")

  val aucSql: String =
    """WITH g AS (
      |  SELECT value AS s,
      |         sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS pos,
      |         sum(CASE WHEN event_type <> 'purchase' THEN 1 ELSE 0 END) AS neg
      |  FROM events WHERE value IS NOT NULL AND event_type IS NOT NULL
      |  GROUP BY 1),
      |r AS (
      |  SELECT pos, neg,
      |         coalesce(sum(neg) OVER (ORDER BY s
      |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS nb
      |  FROM g)
      |SELECT CAST(sum(pos) AS BIGINT) AS n_pos, CAST(sum(neg) AS BIGINT) AS n_neg,
      |       CAST(sum(pos * (2 * nb + neg)) AS BIGINT) AS auc_num2,
      |       CASE WHEN sum(pos) > 0 AND sum(neg) > 0
      |            THEN round(CAST(sum(pos * (2 * nb + neg)) AS DOUBLE)
      |                       / (2.0 * sum(pos) * sum(neg)), 6) END AS auc
      |FROM r""".stripMargin

  // ---- calibration / reliability bins ---------------------------------

  /** Reliability diagram of the piecewise-linear score
    * min(value,30)/30 against the purchase label
    * ([[graft.functions.Eval.calibrationBins]], 10 bins). */
  def calibration(s: SparkSession, dir: String): DataFrame =
    graft.functions.Eval.calibrationBins(ev(s, dir),
        least(col("value"), lit(30.0)) / 30.0,
        col("event_type") === "purchase", 10)
      .orderBy("bin")

  val calibrationSql: String =
    """WITH sc AS (
      |  SELECT LEAST(value, 30.0) / 30.0 AS s,
      |         event_type = 'purchase' AS y
      |  FROM events WHERE value IS NOT NULL AND event_type IS NOT NULL
      |    AND NOT isnan(CAST(value AS DOUBLE)))
      |SELECT GREATEST(LEAST(CAST(floor(s * 10) AS BIGINT), 9), 0) AS bin,
      |       count(*) AS n,
      |       CAST(sum(CASE WHEN y THEN 1 ELSE 0 END) AS BIGINT) AS n_pos,
      |       round(CAST(sum(CASE WHEN y THEN 1 ELSE 0 END) AS DOUBLE)
      |             / count(*), 6) AS frac_pos,
      |       round(round(sum(s), 6) / count(*), 6) AS mean_score
      |FROM sc GROUP BY 1 ORDER BY bin""".stripMargin

  // ---- Pearson correlation matrix -------------------------------------

  /** Pairwise Pearson correlation of lineitem quantity / discount / tax
    * in one pass ([[graft.functions.Eval.pearsonMatrix]]). The inputs
    * are INTEGERIZED first (quantity is integral; discount and tax
    * ×100 land on exact integers — correlation is scale-invariant), so
    * every sum both engines fold is an exact integer at any
    * aggregation order. */
  def featureCorr(s: SparkSession, dir: String): DataFrame = {
    val l = graft.sources.Tables.read(s, dir, "lineitem")
      .select(col("l_quantity").as("qty"),
        round(col("l_discount") * 100).as("disc100"),
        round(col("l_tax") * 100).as("tax100"))
    graft.functions.Eval.pearsonMatrix(l, Seq("qty", "disc100", "tax100"))
      .orderBy("col_a", "col_b")
  }

  val featureCorrSql: String =
    """WITH c AS (
      |  SELECT l_quantity AS a, round(l_discount * 100) AS b,
      |         round(l_tax * 100) AS t
      |  FROM lineitem
      |  WHERE l_quantity IS NOT NULL AND l_discount IS NOT NULL
      |    AND l_tax IS NOT NULL),
      |w AS (
      |  SELECT count(*) AS n,
      |         round(sum(a), 6) AS sa, round(sum(b), 6) AS sb,
      |         round(sum(t), 6) AS st,
      |         round(sum(a * a), 6) AS qa, round(sum(b * b), 6) AS qb,
      |         round(sum(t * t), 6) AS qt,
      |         round(sum(a * b), 6) AS pab, round(sum(a * t), 6) AS pat,
      |         round(sum(b * t), 6) AS pbt
      |  FROM c)
      |SELECT 'disc100' AS col_a, 'tax100' AS col_b, n,
      |       CASE WHEN (n * qb - sb * sb) > 0 AND (n * qt - st * st) > 0
      |            THEN round((n * pbt - sb * st)
      |                 / sqrt((n * qb - sb * sb) * (n * qt - st * st)), 6) END AS corr
      |FROM w
      |UNION ALL
      |SELECT 'qty', 'disc100', n,
      |       CASE WHEN (n * qa - sa * sa) > 0 AND (n * qb - sb * sb) > 0
      |            THEN round((n * pab - sa * sb)
      |                 / sqrt((n * qa - sa * sa) * (n * qb - sb * sb)), 6) END
      |FROM w
      |UNION ALL
      |SELECT 'qty', 'tax100', n,
      |       CASE WHEN (n * qa - sa * sa) > 0 AND (n * qt - st * st) > 0
      |            THEN round((n * pat - sa * st)
      |                 / sqrt((n * qa - sa * sa) * (n * qt - st * st)), 6) END
      |FROM w
      |ORDER BY col_a, col_b""".stripMargin

  // ---- mutual information / chi-squared -------------------------------

  /** Mutual information + χ² between event_type and the integer
    * day-of-week of the event (epoch-day mod 7 — no calendar/timezone
    * functions, identical on every engine)
    * ([[graft.functions.Eval.mutualInfoChi2]]). */
  def mutualInfo(s: SparkSession, dir: String): DataFrame =
    graft.functions.Eval.mutualInfoChi2(ev(s, dir),
      col("event_type"), expr("(unix_micros(ts) div 86400000000) % 7"))

  val mutualInfoSql: String =
    """WITH cells AS (
      |  SELECT coalesce(CAST(event_type AS VARCHAR), '<null>') AS x,
      |         coalesce(CAST((epoch_us(ts) // 86400000000) % 7 AS VARCHAR),
      |                  '<null>') AS y,
      |         count(*) AS nxy
      |  FROM events GROUP BY 1, 2),
      |xm AS (SELECT x, sum(nxy) AS nx FROM cells GROUP BY 1),
      |ym AS (SELECT y, sum(nxy) AS ny FROM cells GROUP BY 1),
      |t AS (SELECT sum(nxy) AS n FROM cells)
      |SELECT CAST(max(t.n) AS BIGINT) AS n, count(*) AS n_cells,
      |  round(sum((CAST(nxy AS DOUBLE) / t.n)
      |            * ln(CAST(nxy AS DOUBLE) * t.n
      |                 / (CAST(nx AS DOUBLE) * ny))), 6) AS mi,
      |  round(sum(CAST(nxy AS DOUBLE) * nxy * t.n
      |            / (CAST(nx AS DOUBLE) * ny)) - max(t.n), 6) AS chi2
      |FROM cells JOIN xm USING (x) JOIN ym USING (y) CROSS JOIN t""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_funnel" -> (funnel _),
    "q_retention" -> (retention _),
    "q_target_encode" -> (targetEncode _),
    "q_golden_record" -> (goldenRecord _),
    "q_kappa" -> (kappa _),
    "q_auc" -> (auc _),
    "q_calibration" -> (calibration _),
    "q_feature_corr" -> (featureCorr _),
    "q_mutual_info" -> (mutualInfo _))

  val oracles: Map[String, String] = Map(
    "q_funnel" -> funnelSql,
    "q_retention" -> retentionSql,
    "q_target_encode" -> targetEncodeSql,
    "q_golden_record" -> goldenRecordSql,
    "q_kappa" -> kappaSql,
    "q_auc" -> aucSql,
    "q_calibration" -> calibrationSql,
    "q_feature_corr" -> featureCorrSql,
    "q_mutual_info" -> mutualInfoSql)
}
