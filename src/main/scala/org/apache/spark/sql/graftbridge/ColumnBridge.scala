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

  /** Register a custom expression under a SQL-callable name in the session's
    * function registry (so `spark.sql("SELECT simhash64(...)")` works).
    */
  def registerFunction(spark: org.apache.spark.sql.SparkSession, name: String,
                       builder: Seq[Expression] => Expression): Unit =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry
      .createOrReplaceTempFunction(name, builder, "built-in")

  /** Re-root a DataFrame's logical plan in another session of the same
    * SparkContext — how the bloom-sketch builder runs under raised
    * runtime-filter caps in a CLONED session instead of mutating the
    * caller's shared conf. `Dataset.ofRows` is `private[sql]`.
    */
  def ofRows(spark: org.apache.spark.sql.SparkSession,
             df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession],
      df.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]].queryExecution.logical)

  /** Apply a SparkSessionExtensions' injected functions to a registry —
    * `registerFunctions` is `private[sql]`, re-exposed here so specs can
    * verify an extensions provider without building a whole new session.
    */
  def applyExtensions(ext: org.apache.spark.sql.SparkSessionExtensions,
                      registry: org.apache.spark.sql.catalyst.analysis.FunctionRegistry)
      : org.apache.spark.sql.catalyst.analysis.FunctionRegistry =
    ext.registerFunctions(registry)
}
