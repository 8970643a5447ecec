package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column <-> Expression bridge: the converters live in `private[sql]`
  * scope since the Spark 4 Connect refactor, so extension libraries expose
  * them from a package object under org.apache.spark.sql (the standard
  * pattern for Catalyst-extension libraries). */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
