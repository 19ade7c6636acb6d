package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4 moved Column to sql-api and made the Column↔Expression
  * bridge private[sql]; custom Catalyst expressions still need it to be
  * surfaced as Columns. This shim lives in the sql package hierarchy
  * solely to re-export those two conversions for graft.expressions.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
