package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Minimal bridge to Spark's private[sql] Column ↔ Expression converters —
  * the standard shim every Spark extension library ships so custom
  * Catalyst expressions can surface as Columns without registering a SQL
  * function first. No Spark internals are modified.
  */
object GraftSqlBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
