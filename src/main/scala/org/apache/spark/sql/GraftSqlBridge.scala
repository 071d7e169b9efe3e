package org.apache.spark.sql

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
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

  /** Wrap a (resolved) logical plan as a DataFrame — the entry point a
    * custom logical operator needs to surface through the public API. */
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** The analyzed plan behind a DataFrame (resolved attributes, ready to
    * become the child of a custom logical node). */
  def analyzed(df: DataFrame): LogicalPlan =
    df.queryExecution.analyzed

  /** Test access to an extension object's built post-hoc resolution
    * rules (the injection surface is private[sql]). */
  def postHocResolutionRules(ext: SparkSessionExtensions,
      spark: SparkSession): Seq[catalyst.rules.Rule[LogicalPlan]] =
    ext.buildPostHocResolutionRules(spark)

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
