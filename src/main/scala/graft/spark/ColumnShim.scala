/* Shim in the org.apache.spark.sql namespace: ExpressionUtils (the
 * Column <-> catalyst Expression bridge) is private[sql] in Spark 4, and
 * wrapping a custom Catalyst Expression as a user-facing Column requires
 * it. This is the library's single point of contact with Spark-private
 * API. */
package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

object ColumnShim {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
