package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Catalyst-Expression bridge.
  *
  * `ExpressionUtils` is `private[sql]` in Spark 4, so the (standard)
  * way for an external library to wrap a custom native Expression as a
  * `Column` is a one-liner inside an `org.apache.spark.sql` subpackage
  * — the same pattern Delta Lake and other Spark-native libraries use.
  * Everything else in this repo lives under `graft.*`.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Register a temp function on an existing session
    * (`sessionState` is likewise `private[sql]`). */
  def registerTempFunction(spark: org.apache.spark.sql.SparkSession,
      name: String, builder: Seq[Expression] => Expression): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      name, builder, "built-in")
}
