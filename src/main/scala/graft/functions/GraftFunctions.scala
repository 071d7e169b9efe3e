package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge, SparkSession}

/** DataFrame + SQL surface for graft's native Catalyst expressions. */
object GraftFunctions {

  /** Fixed-point (1e9) dot product of two `array<float>` columns —
    * codegen'd; see [[DotFp9]]. */
  def dot_fp9(a: Column, b: Column): Column =
    GraftSqlBridge.column(
      DotFp9(GraftSqlBridge.expression(a), GraftSqlBridge.expression(b)))

  /** Register graft functions into a session's catalog so `spark.sql`
    * text can call them by name. Idempotent. */
  def register(spark: SparkSession): Unit =
    GraftSqlBridge.registerFunction(
      spark, "dot_fp9", children => DotFp9(children(0), children(1)),
      classOf[DotFp9])
}
