package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge to the package-private Column⇄Expression converters (Spark 4 moved
  * them behind `private[sql] classic.ExpressionUtils`). Standard extension
  * pattern for libraries shipping native Catalyst expressions. */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** `AbstractDataType` is private[sql] in Spark 4; alias it here so graft
    * expressions can declare `inputTypes` (ExpectsInputTypes). */
  type AbstractType = org.apache.spark.sql.types.AbstractDataType

  /** Register a native function on an already-created session (the
    * extensions config path only applies at session construction). */
  def registerTempFunction(
      spark: SparkSession, name: String,
      builder: Seq[Expression] => Expression): Unit =
    spark.sessionState.functionRegistry
      .createOrReplaceTempFunction(name, builder, "scala_udf")
}
