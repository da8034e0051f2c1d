package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge to the package-private Column⇄Expression converters (Spark 4 moved
  * them behind `private[sql] classic.ExpressionUtils`). Standard extension
  * pattern for libraries shipping native Catalyst expressions. */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
