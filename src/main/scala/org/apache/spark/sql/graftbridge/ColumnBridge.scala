package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ↔ Expression bridge for custom Catalyst expressions.
  *
  * Spark 4's `Column` is column-node-backed and the classic converter
  * (`org.apache.spark.sql.classic.ExpressionUtils`) is `private[sql]`;
  * extension libraries conventionally reach it from an
  * `org.apache.spark.sql` subpackage. This object is the engine's single
  * such access point.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
