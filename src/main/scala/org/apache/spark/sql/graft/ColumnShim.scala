package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge between our custom Catalyst expressions and the public Column
  * API. `ExpressionUtils` is `private[sql]` in Spark 4, so this shim
  * lives in an `org.apache.spark.sql` subpackage — the standard pattern
  * for Spark-native extension libraries; no Spark internals are modified
  * or shadowed. */
object ColumnShim {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
