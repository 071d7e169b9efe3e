package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions._

/** Catalyst extension installer — the builder-time twin of
  * `GraftFunctions.register` (which registers into an already-built
  * session). Configure with:
  *
  * {{{
  *   spark.sql.extensions=graft.GraftExtensions
  * }}}
  *
  * and every session in the cluster resolves the graft functions in SQL
  * text, including from pure-SQL clients (thriftserver, spark-sql) that
  * never touch the Scala API. This is the standard packaging for a
  * Spark-native library's custom expressions. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def fn(name: String, builder: Seq[Expression] => Expression,
      clazz: Class[_]): (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier(name), new ExpressionInfo(clazz.getName, name), builder)

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(fn("dot_fp9",
      es => DotFp9(es(0), es(1)), classOf[DotFp9]))
    ext.injectFunction(fn("shingle_hash32",
      es => ShingleHash32Expr(es(0)), classOf[ShingleHash32Expr]))
    ext.injectFunction(fn("simhash32",
      es => SimHash32Expr(es(0)), classOf[SimHash32Expr]))
    ext.injectFunction(fn("min_md5",
      es => MinMd5Expr(es(0)), classOf[MinMd5Expr]))
    ext.injectFunction(fn("dot_i64",
      es => DotI64(es(0), es(1)), classOf[DotI64]))
    ext.injectFunction(fn("zorder16",
      es => ZOrder16Expr(es(0), es(1)), classOf[ZOrder16Expr]))
    ext.injectFunction(fn("nfc",
      es => NfcNormalizeExpr(es(0)), classOf[NfcNormalizeExpr]))
    // Whole-operator extension: the native as-of join's planner strategy
    // (logical GraftAsOfJoin → physical AsOfMergeJoinExec). Sessions not
    // built with extensions get it lazily via AsOfMergeJoin.install.
    ext.injectPlannerStrategy(_ => graft.plans.AsOfMergeJoin.Strategy)
    // Analyzer-rule extension (the third Catalyst extension point):
    // Spark's own merge_asof logical node routes to the native exec
    // instead of the stock join+aggregate rewrite.
    ext.injectPostHocResolutionRule(_ =>
      graft.plans.AsOfMergeJoin.InterceptSparkAsOfJoin)
  }
}
