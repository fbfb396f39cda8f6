package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4 moved the Column ↔ Expression constructors behind
  * `private[sql]` (Column is a thin ColumnNode wrapper in sql-api).
  * This bridge lives inside the `org.apache.spark.sql` namespace to
  * expose exactly the two conversions a custom Catalyst expression
  * needs for a Column-API entry point. */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
