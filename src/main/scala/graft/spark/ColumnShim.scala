/* Shim in the org.apache.spark.sql namespace: ExpressionUtils (the
 * Column <-> catalyst Expression bridge) is private[sql] in Spark 4, and
 * wrapping a custom Catalyst Expression as a user-facing Column requires
 * it. This is the library's single point of contact with Spark-private
 * API. */
package org.apache.spark.sql.graftshim

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.classic.ExpressionUtils

object ColumnShim {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Wrap a (resolved) logical plan as a user-facing DataFrame —
    * Dataset.ofRows is private[sql]; needed to hand custom LogicalPlan
    * nodes (graft.plans) back to user code. */
  def dataFrame(spark: SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  /** Clone a live session: shared SparkContext/SharedState (same
    * executors, cache manager, catalog data), but an independent
    * SessionState whose runtime conf starts as a snapshot of the
    * parent's and can then diverge — the per-plan conf-scoping
    * primitive (cloneSession is private[sql]). Unlike the public
    * newSession(), the clone KEEPS the parent's runtime conf
    * (session timezone, shuffle partitions, …), which is load-bearing
    * for result parity. */
  def cloneSession(spark: SparkSession): SparkSession =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession].cloneSession()

  /** Register a SQL function into a LIVE session's function registry
    * (sessionState is private[sql]; SparkSessionExtensions only applies
    * at session build time). */
  def registerFunction(
      spark: SparkSession,
      name: String,
      info: ExpressionInfo,
      builder: Seq[Expression] => Expression): Unit =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry
      .registerFunction(FunctionIdentifier(name), info, builder)
}
