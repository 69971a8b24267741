package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality rules evaluated in ONE pass: each rule is a
  * boolean Column that must hold per row; the report is one row per
  * rule with its violation count — the expectation-suite gate a
  * pipeline runs before promoting a batch (schema-level checks live in
  * [[graft.registry.Inference]]; these are VALUE-level).
  *
  * All rules evaluate inside a single aggregation over a single scan
  * (conditional sums fuse into one codegen stage) — adding a rule never
  * adds a pass, which is the property that matters when the batch is
  * 100 TB. Null handling: a null predicate result counts as a
  * violation (SQL three-valued logic would otherwise let null-laden
  * rows pass every range check silently).
  */
object Validate {

  final case class Rule(name: String, holds: Column)

  /** @return one row per rule: (rule, n_rows, n_violations, pass) in
    *         declaration order. */
  def report(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    require(rules.nonEmpty, "validate needs at least one rule")
    require(rules.map(_.name).distinct.size == rules.size, "rule names must be unique")
    // names are interpolated into the stack() SQL below — restrict to
    // identifier characters instead of trying to escape
    rules.foreach(r => require(r.name.matches("[A-Za-z0-9_]+"),
      s"rule name must match [A-Za-z0-9_]+, got '${r.name}'"))
    // coalesce to 0: over an EMPTY batch sum() is null, which would
    // make n_violations null and pass = null — a gate that neither
    // passes nor fails. An empty batch violates nothing.
    val aggs = count(lit(1)).as("__n") +:
      rules.map(r => coalesce(
        sum((!coalesce(r.holds, lit(false))).cast("long")), lit(0L)).as(s"__v_${r.name}"))
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val stackArgs = rules.map(r =>
      s"'${r.name}', __n, `__v_${r.name}`").mkString(",\n  ")
    wide.select(expr(
      s"""stack(${rules.size},
         |  $stackArgs)
         |AS (rule, n_rows, n_violations)""".stripMargin))
      .withColumn("pass", col("n_violations") === 0L)
  }

  /** Cohen's kappa (Cohen 1960) between two binary annotators — the
    * inter-annotator agreement gate of a labeling pipeline: raw
    * agreement p_o corrected by the agreement p_e two INDEPENDENT
    * annotators with the same marginals would reach by chance
    * (two raters that both say "yes" 95% of the time agree 90.5% by
    * luck alone; kappa scores only the surplus).
    *
    *   kappa = (p_o − p_e) / (1 − p_e),
    *   p_e = p_a·p_b + (1−p_a)(1−p_b)
    *
    * One conditional-sum aggregation over one scan (the [[report]]
    * shape): the 2×2 contingency counts are integers — exact at any
    * aggregation order — and every derived double is a fixed-order
    * expression over them, so the statistic is bit-identical on any
    * engine and at any scale. Rows where either annotator is null are
    * excluded (un-annotated items rate nobody's agreement). Returns
    * one row: (n, n_both, n_only_a, n_only_b, n_neither, po, pe,
    * kappa), each rate rounded to 6dp; kappa is null for the
    * degenerate p_e = 1 case (both raters constant).
    */
  def cohenKappa(df: DataFrame, aCol: Column, bCol: Column): DataFrame = {
    // the null filter runs on the CASTED values: a raw value that casts
    // to null (e.g. an 'unsure' string annotation) would otherwise pass
    // the raw-column filter, count into n, and vanish from every
    // contingency cell — deflating po and the marginals silently.
    // try_cast, not cast: ANSI mode (the Spark 4 default) makes a plain
    // cast THROW on the malformed value instead of nulling it
    // (review r12)
    val both = df
      .select(aCol.try_cast("boolean").as("__a"), bCol.try_cast("boolean").as("__b"))
      .filter(col("__a").isNotNull && col("__b").isNotNull)
    val c = both.agg(
      count(lit(1)).as("n"),
      sum((col("__a") && col("__b")).cast("long")).as("n_both"),
      sum((col("__a") && !col("__b")).cast("long")).as("n_only_a"),
      sum((!col("__a") && col("__b")).cast("long")).as("n_only_b"),
      sum((!col("__a") && !col("__b")).cast("long")).as("n_neither"))
    val nD = col("n").cast("double")
    val po = (col("n_both") + col("n_neither")).cast("double") / nD
    val pa = (col("n_both") + col("n_only_a")).cast("double") / nD
    val pb = (col("n_both") + col("n_only_b")).cast("double") / nD
    val pe = pa * pb + (lit(1.0) - pa) * (lit(1.0) - pb)
    c.select(col("n"), col("n_both"), col("n_only_a"), col("n_only_b"),
      col("n_neither"),
      round(po, 6).as("po"), round(pe, 6).as("pe"),
      when(pe < 1.0, round((po - pe) / (lit(1.0) - pe), 6)).as("kappa"))
  }
}
