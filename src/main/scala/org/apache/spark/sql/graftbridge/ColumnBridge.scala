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

  /** EAGER Column → catalyst Expression conversion. [[expression]]
    * returns a lazy `ColumnNodeExpression` wrapper, which is fine as
    * a child of another Column-wrapped expression (the Dataset
    * analyzer unwraps it) but NOT for embedding directly into a
    * custom LogicalPlan node: the wrapper drags non-serializable
    * `sql.internal` nodes into task closures. This converts to the
    * real catalyst tree (e.g. a catalyst `SortOrder` for
    * `col(...).desc`) up front. */
  def catalystExpression(c: Column): Expression =
    org.apache.spark.sql.classic.ColumnNodeToExpressionConverter(c.node)

  /** DataFrame from a custom LogicalPlan (`Dataset.ofRows` is
    * `private[sql]`) — how a library-defined logical operator
    * (graft.plans.*) enters the DataFrame API. */
  def ofRows(spark: org.apache.spark.sql.SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  /** A DataFrame's analyzed logical plan (the `queryExecution` handle
    * is on the classic Dataset). */
  def logicalPlan(df: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.catalyst.plans.logical.LogicalPlan =
    df.asInstanceOf[org.apache.spark.sql.classic.DataFrame]
      .queryExecution.analyzed
}
