package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into the `private[sql]` Column ↔ Expression converters — the
  * standard extension-library pattern for registering custom Catalyst
  * expressions without a full FunctionRegistry plugin (cf. the public
  * DatasetFactory/ExpressionUtils bridges in Spark extension projects).
  * Kept to exactly these two forwarders.
  */
object GraftSqlBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
