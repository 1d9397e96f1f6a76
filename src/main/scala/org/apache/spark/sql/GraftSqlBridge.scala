package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Column ⇄ Expression bridge for graft's native codegen expressions.
  * Spark 4's `classic.ExpressionUtils` is `private[sql]`; exposing it
  * from within the `org.apache.spark.sql` package is the standard
  * pattern for libraries shipping custom Catalyst expressions. */
object GraftSqlBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)

  /** Full ColumnNode → Expression conversion. `ExpressionUtils
    * .expression` only wraps the node lazily (`ColumnNodeExpression`),
    * which the analyzer never recurses into when the column tree came
    * from the public DSL (`UnresolvedFunction`s inside would reach
    * codegen unresolved); the classic converter resolves the whole
    * tree eagerly. */
  def expression(c: Column): Expression =
    classic.ColumnNodeToExpressionConverter(c.node)

  /** Register a SQL function on a LIVE session (the
    * `SparkSessionExtensions` route only applies to sessions built with
    * the extension installed; `sessionState` is `private[sql]`). */
  def registerFunction(
      spark: SparkSession,
      desc: (org.apache.spark.sql.catalyst.FunctionIdentifier,
        org.apache.spark.sql.catalyst.expressions.ExpressionInfo,
        Seq[Expression] => Expression)): Unit =
    spark.sessionState.functionRegistry.registerFunction(desc._1, desc._2, desc._3)
}
