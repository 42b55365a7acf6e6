package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into the sql-private Column<->Expression converters — the
  * standard pattern for libraries contributing native Catalyst expressions
  * (Spark 4 no longer exposes Column.expr publicly). */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
