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
    val aggs = count(lit(1)).as("__n") +:
      rules.map(r => sum((!coalesce(r.holds, lit(false))).cast("long")).as(s"__v_${r.name}"))
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val stackArgs = rules.map(r =>
      s"'${r.name}', __n, `__v_${r.name}`").mkString(",\n  ")
    wide.select(expr(
      s"""stack(${rules.size},
         |  $stackArgs)
         |AS (rule, n_rows, n_violations)""".stripMargin))
      .withColumn("pass", col("n_violations") === 0L)
  }
}
