package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ↔ Expression bridge. Spark 4 made the Column(expr) constructor
  * internal (`private[sql] ExpressionUtils`); a custom Catalyst expression
  * library needs exactly these two conversions, so this shim lives under
  * the org.apache.spark.sql package to reach them — the standard pattern
  * for external expression packages. No other internals are touched. */
object ColumnBridge {
  def toColumn(e: Expression): Column = ExpressionUtils.column(e)
  def toExpression(c: Column): Expression = ExpressionUtils.expression(c)
}
