package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Classic-mode Column ↔ catalyst Expression bridge. The underlying
  * converters are `private[sql]` in Spark 4, so this one-file shim lives
  * in the spark.sql package — the conventional extension-library pattern
  * for exposing native expressions through the Column API.
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
