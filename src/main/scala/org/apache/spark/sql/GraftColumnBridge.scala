package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Spark 4 removed the public Column(Expression) constructor and `.expr`;
  * the sanctioned bridge (`classic.ExpressionUtils`) is private[sql], so
  * this shim re-exports it for the graft engine's custom Catalyst
  * expressions. Same approach Spark's own connectors use.
  */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)

  /** Convert through ColumnNodeToExpressionConverter (not
    * ExpressionUtils.expression, whose lazy ColumnNodeExpression wrapper is
    * Unevaluable and invisible to the analyzer when embedded in a
    * FunctionRegistry builder's output).
    */
  def expression(c: Column): Expression =
    classic.ColumnNodeToExpressionConverter.apply(c.node)
}
