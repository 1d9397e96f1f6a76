package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Column ⇄ Expression bridge for graft's native codegen expressions.
  * Spark 4's `classic.ExpressionUtils` is `private[sql]`; exposing it
  * from within the `org.apache.spark.sql` package is the standard
  * pattern for libraries shipping custom Catalyst expressions. */
object GraftSqlBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
