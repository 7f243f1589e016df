package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into the `private[sql]` Column ⇄ Expression converters (the
  * Spark 4 Column API is ColumnNode-based for Connect; classic
  * conversions live behind package-private `ExpressionUtils`). Placing
  * this object under `org.apache.spark.sql` is the conventional shim
  * used by Spark extension libraries to lift custom Catalyst
  * expressions into the public Column API.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
