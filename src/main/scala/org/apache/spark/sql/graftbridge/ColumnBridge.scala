package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4 removed public `Column.expr` / `new Column(expr)`; the classic
  * conversions live in `private[sql]` ExpressionUtils. This bridge (inside
  * the sql package namespace) re-exposes exactly the two conversions the
  * graft custom-expression layer needs.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
