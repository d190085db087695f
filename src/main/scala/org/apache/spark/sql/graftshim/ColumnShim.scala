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
