package org.apache.spark.sql

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into Spark's `private[sql]` surface, the standard shim every
  * Catalyst-extension library ships: wrap a raw `Expression` as a
  * user-facing `Column` and reach the session's function registry for
  * runtime registration (the only non-builder-time registration path).
  * Keep this file free of logic — graft code lives in `graft.*`.
  */
object GraftSqlBridge {

  def column(e: Expression): Column = ExpressionUtils.column(e)

  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  def registerFunction(
      spark: SparkSession,
      name: String,
      builder: Seq[Expression] => Expression,
      exprClass: Class[_]): Unit = {
    val registry: FunctionRegistry = spark.sessionState.functionRegistry
    val ident = FunctionIdentifier(name)
    if (!registry.functionExists(ident)) {
      registry.registerFunction(
        ident, new ExpressionInfo(exprClass.getName, name), builder)
    }
  }
}
