package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column <-> Expression bridge for graft's custom Catalyst expressions.
  *
  * Spark 4 made the converters `private[sql]`
  * (org.apache.spark.sql.classic.ExpressionUtils); extension libraries
  * reach them from an org.apache.spark.sql subpackage — the same access
  * path Spark's own modules use.
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
