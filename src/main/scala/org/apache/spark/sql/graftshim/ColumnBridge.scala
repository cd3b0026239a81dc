package org.apache.spark.sql.graftshim

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ↔ Expression and LogicalPlan → DataFrame bridges. Spark 4 made
  * the Column(expr) constructor and Dataset.ofRows internal
  * (`private[sql]`); a custom Catalyst operator/expression library needs
  * exactly these conversions, so this shim lives under the
  * org.apache.spark.sql package to reach them — the standard pattern for
  * external plan/expression packages. No other internals are touched. */
object ColumnBridge {
  def toColumn(e: Expression): Column = ExpressionUtils.column(e)

  /** Eagerly convert through the ColumnNode converter: the lazy
    * `ExpressionUtils.expression` wrapper keeps the non-serializable
    * `sql.internal` node tree alive inside the expression (fatal once the
    * expression ships in a task closure, e.g. sort orders in a custom
    * physical operator). */
  def toExpression(c: Column): Expression =
    org.apache.spark.sql.classic.ColumnNodeToExpressionConverter(c.node)

  /** Wrap a (possibly custom) logical plan as a DataFrame; runs the full
    * analyzer, so unresolved attributes inside custom nodes resolve. */
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)
}
