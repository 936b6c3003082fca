package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4 made Column<->Expression conversion private[sql]
  * (columnNodeSupport.scala); extensions that define custom Catalyst
  * expressions need this two-line bridge living under the sql package
  * namespace — the established pattern for third-party Spark libraries.
  */
object ColumnBridge {
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
  def column(e: Expression): Column = ExpressionUtils.column(e)
}
