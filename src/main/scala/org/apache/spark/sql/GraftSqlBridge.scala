package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/**
 * Bridge into Spark's sql-private Column↔Expression conversions for the
 * graft engine's native expressions (Spark 4 made Column ColumnNode-backed;
 * extension libraries reach the classic converters through a same-package
 * shim — the established pattern for DataSource/extension projects).
 */
object GraftSqlBridge {
  def toColumn(e: Expression): Column = ExpressionUtils.column(e)
  def toExpression(c: Column): Expression = ExpressionUtils.expression(c)
}
