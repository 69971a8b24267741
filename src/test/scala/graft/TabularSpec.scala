package graft

import java.sql.Timestamp
import java.time.Duration

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{Encoding, Validate}
import graft.operators.{Funnel, Survivorship}

/** Edge-case unit tests for the round-8 event-analytics / tabular-ML
  * operators (value-level behavior the sf0.01 oracle data doesn't
  * necessarily exercise: order violations, gap cutoffs, all-null
  * fields, degenerate kappa). */
class TabularSpec extends AnyFunSuite {

  lazy val spark: SparkSession = {
    val s = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("funnel: order violations, gap cutoff, and strict-after ties") {
    import spark.implicits._
    val events = Seq(
      // u1 converts fully in order, inside the gap
      (1L, ts("2024-01-01 00:00:00"), "A"),
      (1L, ts("2024-01-02 00:00:00"), "B"),
      (1L, ts("2024-01-03 00:00:00"), "C"),
      // u2 does B BEFORE A -> never reaches step 2
      (2L, ts("2024-01-02 00:00:00"), "B"),
      (2L, ts("2024-01-03 00:00:00"), "A"),
      // u3 reaches B only past the 7-day gap
      (3L, ts("2024-01-01 00:00:00"), "A"),
      (3L, ts("2024-01-09 00:00:01"), "B"),
      // u4: B at the SAME instant as A -> strictly-after excludes it
      (4L, ts("2024-01-01 00:00:00"), "A"),
      (4L, ts("2024-01-01 00:00:00"), "B")
    ).toDF("user_id", "ts", "step")
    val got = Funnel.funnel(events, "user_id", "ts", "step",
        Seq("A", "B", "C"), Some(Duration.ofDays(7)))
      .collect().map(r => (r.getInt(0), r.getLong(2))).toMap
    assert(got === Map(1 -> 4L, 2 -> 1L, 3 -> 1L))
  }

  test("funnel: gap boundary is inclusive and re-tries later events") {
    import spark.implicits._
    val events = Seq(
      // B exactly at the 7-day boundary counts
      (1L, ts("2024-01-01 00:00:00"), "A"),
      (1L, ts("2024-01-08 00:00:00"), "B"),
      // u2's first B is too early (ties A), second B qualifies
      (2L, ts("2024-01-01 00:00:00"), "A"),
      (2L, ts("2024-01-01 00:00:00"), "B"),
      (2L, ts("2024-01-02 00:00:00"), "B")
    ).toDF("user_id", "ts", "step")
    val got = Funnel.funnel(events, "user_id", "ts", "step",
        Seq("A", "B"), Some(Duration.ofDays(7)))
      .collect().map(r => (r.getInt(0), r.getLong(2))).toMap
    assert(got === Map(1 -> 2L, 2 -> 2L))
  }

  test("retention: offset zero equals cohort size; multi-period activity counted once") {
    import spark.implicits._
    val origin = 1704067200000000L // 2024-01-01 UTC
    val events = Seq(
      (1L, ts("2024-01-01 10:00:00")), // cohort 0
      (1L, ts("2024-01-02 10:00:00")), // same period, dedup'd
      (1L, ts("2024-01-10 10:00:00")), // period 1
      (2L, ts("2024-01-03 10:00:00")), // cohort 0, never returns
      (3L, ts("2024-01-09 10:00:00"))  // cohort 1
    ).toDF("user_id", "ts")
    val got = Funnel.retention(events, "user_id", "ts", origin, 7)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), (r.getLong(2), r.getLong(3)))).toMap
    assert(got === Map(
      (0L, 0L) -> ((2L, 2L)), // both cohort-0 users active at offset 0
      (0L, 1L) -> ((1L, 2L)), // only u1 returns
      (1L, 0L) -> ((1L, 1L))))
  }

  test("target encoding: holdout excludes own fold; single-fold category gets the prior") {
    import spark.implicits._
    // cat x: fold 0 -> t=10 (1 row), fold 1 -> t=20 (1 row)
    // cat y: only fold 0 -> t=100 (2 rows)
    val df = Seq(
      ("x", 0L, 10L), ("x", 1L, 20L), ("y", 0L, 100L), ("y", 0L, 100L)
    ).toDF("cat", "fold", "t")
    val prior = math.rint((10.0 + 20 + 100 + 100) / 4 * 1e6) / 1e6 // 57.5
    val got = Encoding.targetEncodeOof(df, "cat", "t", "fold", smoothing = 2.0)
      .collect().map(r => ((r.getString(0), r.getLong(1)), (r.getLong(2), r.getDouble(3)))).toMap
    // x/fold0 holdout = {20}: (20 + 2*57.5) / (1 + 2) = 45.0
    assert(got(("x", 0L)) === ((1L, 45.0)))
    // x/fold1 holdout = {10}: (10 + 115) / 3
    assert(got(("x", 1L)) === ((1L, math.rint(125.0 / 3 * 1e6) / 1e6)))
    // y/fold0 holdout empty -> pure prior: (0 + 115) / (0 + 2) = 57.5
    assert(got(("y", 0L)) === ((0L, prior)))
  }

  test("drift and encoding treat a NULL group/category as a first-class level (review r6)") {
    import spark.implicits._
    import graft.functions.{Drift, Encoding}
    // identical baseline/current for a NULL group: KS must be 0, not ~1
    val base = Seq((Some("a"), 1.0), (Some("a"), 2.0),
      (None: Option[String], 5.0), (None: Option[String], 6.0)).toDF("g", "v")
    val ks = Drift.ks(base, base, "v", groupCols = Seq("g"))
      .collect().map(r => Option(r.getString(0)) -> r.getDouble(1)).toMap
    assert(ks(Some("a")) === 0.0 && ks(None) === 0.0,
      s"identical distributions must score KS 0 for every group: $ks")
    // drifted NULL group: PSI must be large, not exactly 0
    val cur = Seq((Some("a"), 1.0), (Some("a"), 2.0),
      (None: Option[String], 50.0), (None: Option[String], 60.0)).toDF("g", "v")
    val psi = Drift.psi(base, cur, "v", edges = Seq(3.0, 10.0), groupCols = Seq("g"))
      .collect().map(r => Option(r.getString(0)) -> r.getAs[Double]("psi")).toMap
    assert(psi(None) > 0.5, s"null group's drift must register: $psi")
    // null category keeps an encoding row
    val enc = Encoding.targetEncodeOof(
      Seq((Some("x"), 1L, 0), (Some("x"), 0L, 1),
        (None: Option[String], 1L, 0), (None: Option[String], 1L, 1)).toDF("c", "y", "f"),
      "c", "y", "f")
    assert(enc.filter(col("category").isNull).count() === 2L,
      "null category must keep its (category, fold) encoding rows")
    // non-integral targets are rejected, not silently truncated
    intercept[IllegalArgumentException](Encoding.targetEncodeOof(
      Seq(("x", 0.7, 0)).toDF("c", "y", "f"), "c", "y", "f"))
  }

  test("golden record: per-field latest non-null beats row-level latest") {
    import spark.implicits._
    val df = Seq(
      // u1: newest row has null v -> golden v comes from the older row
      (1L, 1L, 10L, Some("a"), Some(1.5)),
      (1L, 2L, 20L, Some("b"), None),
      // u2: v null everywhere -> null survives
      (2L, 3L, 10L, Some("c"), None),
      // u3: tie on ts broken by id
      (3L, 4L, 10L, Some("d"), Some(1.0)),
      (3L, 5L, 10L, Some("e"), Some(2.0))
    ).toDF("u", "id", "ord", "name", "v")
    val got = Survivorship.goldenRecord(df, Seq("u"), Seq("ord", "id"), Seq("name", "v"))
      .collect().map(r => (r.getLong(0),
        (r.getString(1), Option(r.get(2)), r.getLong(3), r.getLong(4)))).toMap
    assert(got(1L) === (("b", Some(1.5), 2L, 20L)))
    assert(got(2L) === (("c", None, 1L, 10L)))
    assert(got(3L) === (("e", Some(2.0), 2L, 10L)))
  }

  test("cohen kappa: hand case, null exclusion, and degenerate raters") {
    import spark.implicits._
    // 2x2: both=4, onlyA=1, onlyB=1, neither=4 (n=10)
    // po=0.8, pa=pb=0.5 -> pe=0.5, kappa=0.6; one null row excluded
    val df = (Seq.fill(4)((Some(true), Some(true))) ++
        Seq((Some(true), Some(false)), (Some(false), Some(true))) ++
        Seq.fill(4)((Some(false), Some(false))) ++
        Seq((None: Option[Boolean], Some(true))))
      .toDF("a", "b")
    val r = Validate.cohenKappa(df, col("a"), col("b")).collect().head
    assert(r.getLong(0) === 10L)
    assert(r.getDouble(5) === 0.8 && r.getDouble(6) === 0.5)
    assert(r.getDouble(7) === 0.6)
    // constant raters: pe = 1 -> kappa null, not a division blowup
    val const = Seq((true, true), (true, true)).toDF("a", "b")
    val r2 = Validate.cohenKappa(const, col("a"), col("b")).collect().head
    assert(r2.isNullAt(7))
    // string annotators whose values cast to null ('unsure') must be
    // EXCLUDED like nulls — a raw-column filter counted them into n
    // while every contingency cell skipped them (review r12)
    val str = Seq(("yes", "yes"), ("yes", "no"), ("no", "no"),
      ("unsure", "yes"), ("yes", "unsure")).toDF("a", "b")
    val r3 = Validate.cohenKappa(str, col("a"), col("b")).collect().head
    assert(r3.getLong(0) === 3L, s"non-castable annotations must not count into n: $r3")
    assert(r3.getLong(1) + r3.getLong(2) + r3.getLong(3) + r3.getLong(4) === 3L,
      "contingency cells must sum to n")
  }

  test("psi: a group with zero baseline rows scores NULL, never 'stable' (review r12)") {
    import spark.implicits._
    import graft.functions.Drift
    val base = Seq(("a", 1.0), ("a", 2.0), ("a", 8.0)).toDF("g", "v")
    // group "b" exists ONLY in current, spread near-uniformly across
    // bins — smoothing against a uniform pseudo-baseline would score
    // it ~0 ("stable") exactly where drift is maximal
    val cur = Seq(("a", 1.0), ("a", 2.0), ("a", 8.0),
      ("b", 1.0), ("b", 4.0), ("b", 20.0)).toDF("g", "v")
    val psi = Drift.psi(base, cur, "v", edges = Seq(3.0, 10.0), groupCols = Seq("g"))
      .collect().map(r => r.getString(0) -> Option(r.getAs[java.lang.Double]("psi"))).toMap
    assert(psi("a").exists(_ < 0.01), s"identical group must be ~0: $psi")
    assert(psi("b").isEmpty, s"no-baseline group has NO defined drift: $psi")
    // duplicate edges create a structurally unreachable bin — rejected
    intercept[IllegalArgumentException](
      Drift.psi(base, cur, "v", edges = Seq(0.0, 1.0, 1.0, 5.0)))
    // dotted group-column names address literally, not as nested fields
    val dotted = base.withColumnRenamed("g", "geo.country")
    val cur2 = cur.withColumnRenamed("g", "geo.country")
    val byDotted = Drift.psi(dotted, cur2, "v", Seq(3.0, 10.0), Seq("geo.country"))
      .collect()
    assert(byDotted.length === 2, "dotted group column must resolve literally")
  }

  test("validate report: an EMPTY batch passes every rule (not null-pass)") {
    import spark.implicits._
    // sum() over an empty frame is null; without the coalesce the gate
    // reported n_violations = null and pass = null — neither pass nor
    // fail, which a promotion gate would misread
    val empty = Seq.empty[(Long, Double)].toDF("k", "v")
    val rep = Validate.report(empty, Seq(
        Validate.Rule("k_nonnull", col("k").isNotNull),
        Validate.Rule("v_positive", col("v") > 0)))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getBoolean(3)))).toMap
    assert(rep("k_nonnull") === ((0L, 0L, true)))
    assert(rep("v_positive") === ((0L, 0L, true)))
  }
}
