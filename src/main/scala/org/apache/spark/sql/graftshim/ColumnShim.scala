package org.apache.spark.sql
package graftshim

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge for custom Catalyst expressions: Spark 4 made the
  * Column <-> Expression converters private[sql]
  * (org.apache.spark.sql.classic.ExpressionUtils), so extension
  * libraries expose them from inside the package scope — same
  * technique as other public Spark-native libraries.
  */
object ColumnShim {
  def expression(c: Column): Expression =
    classic.ExpressionUtils.expression(c)
  def column(e: Expression): Column =
    classic.ExpressionUtils.column(e)
}

/** Bridge for custom logical plans: build a DataFrame over an
  * arbitrary LogicalPlan (Dataset.ofRows is private[sql] in the
  * classic API). */
object DatasetShim {
  import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
  def analyzed(df: DataFrame): LogicalPlan =
    df.asInstanceOf[classic.Dataset[_]].queryExecution.analyzed
}
