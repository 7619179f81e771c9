package org.apache.spark.sql.graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Runtime SQL-function registration for an already-built session —
  * `sessionState` is `private[sql]`-adjacent surface in Spark 4, so this
  * lives beside [[ColumnShim]] in the extension shim package. */
object FunctionShim {
  def register(spark: SparkSession, ident: FunctionIdentifier,
      info: ExpressionInfo, builder: Seq[Expression] => Expression): Unit =
    spark.sessionState.functionRegistry
      .registerFunction(ident, info, builder)
}
