package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4 removed the public Column(Expression) constructor; the
  * supported bridge, `classic.ExpressionUtils`, is private[sql]. This shim
  * lives in a subpackage of org.apache.spark.sql to re-export the two
  * conversions our custom Expressions need — the standard pattern for
  * Spark extension libraries that ship Catalyst expressions. */
object ColumnShim {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** True when the column carries an explicit sort direction (`.asc`/
    * `.desc`): its ColumnNode is the private[sql] internal.SortOrder, not
    * a value expression, so it can't be used inside struct()/comparisons. */
  def isSortOrder(c: Column): Boolean =
    c.node.isInstanceOf[org.apache.spark.sql.internal.SortOrder]
}
