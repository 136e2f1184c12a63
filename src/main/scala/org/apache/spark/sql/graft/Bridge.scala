package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ↔ Expression bridge for custom Catalyst expressions.
  *
  * `ExpressionUtils` is private[sql] in Spark 4, so the (one, tiny)
  * crossing point lives in this org.apache.spark.sql subpackage — the
  * standard pattern for Spark extension libraries. Everything else in
  * this repo stays in the graft namespace.
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
