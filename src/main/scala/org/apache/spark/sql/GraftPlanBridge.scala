package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Bridge into `Dataset.ofRows` (private[sql]) so graft can materialize
  * DataFrames from custom logical plans — the documented pattern for
  * libraries extending Catalyst (cf. the public Qbeast `DatasetFactory`).
  */
object GraftPlanBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** Eagerly converts a Column's node tree to a catalyst Expression — the
    * lazy `ColumnNodeExpression` wrapper keeps non-serializable internal
    * nodes alive inside closures.
    */
  def expression(c: Column): org.apache.spark.sql.catalyst.expressions.Expression =
    classic.ColumnNodeToExpressionConverter(c.node)

  /** Wraps a catalyst Expression as a Column (private[sql] constructor). */
  def column(e: org.apache.spark.sql.catalyst.expressions.Expression): Column =
    classic.ExpressionUtils.column(e)

  /** Test hook: materialize the strategies an extensions object injects. */
  def plannerStrategies(e: SparkSessionExtensions, spark: SparkSession) =
    e.buildPlannerStrategies(spark.asInstanceOf[classic.SparkSession])
}
