package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Minimal access shim: Spark 4's Column↔Expression bridge
  * (classic.ExpressionUtils) is private[sql], so custom Catalyst
  * expressions need one forwarding object inside the sql package tree.
  * Nothing else of Spark's internals is touched. */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
