package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into `private[sql]` surface needed by graft's custom Catalyst
  * expressions (Spark 4 removed the public Column(Expression) constructor in
  * favor of column nodes). Standard practice for Spark extension libraries;
  * kept to the two conversions and nothing else.
  */
object GraftSqlBridge {
  def column(e: Expression): Column    = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
