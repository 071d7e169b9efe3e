package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, LongType}

/** Fixed-point (1e9) dot product of two float vectors as a native
  * Catalyst expression with whole-stage codegen.
  *
  * Semantics (must stay bit-identical to the HOF formulation in
  * `operators.Similarity.dotFp9Hof` and the DuckDB oracle):
  * `sum_i round(a[i]::double * b[i]::double * 1e9)` accumulated in
  * Long, rounding half away from zero. Integer accumulation is
  * associative, so the result is independent of evaluation order.
  *
  * Why a custom expression: the equivalent
  * `aggregate(zip_with(a, b, ...), 0L, _+_)` runs interpreted — two
  * lambda invocations per element per row plus an intermediate array
  * allocation. In a k-NN join evaluating millions of pairs that
  * interpreter overhead dominates the actual arithmetic (~50× measured
  * at 125k pairs × 64 dims). This expression compiles to a tight
  * primitive loop inside the generated join stage — the preference
  * order the design calls for: built-in functions, then native
  * `Expression` with `doGenCode`, then (never) UDF.
  *
  * Nulls: null if either array is null (standard BinaryExpression
  * null-intolerance); null *elements* contribute 0 (query vectors are
  * non-null float lists in practice).
  */
case class DotFp9(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(FloatType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"dot_fp9 requires two array<float> inputs, got ${l.sql} and ${r.sql}")
    }

  override def dataType: DataType = LongType

  override def prettyName: String = "dot_fp9"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val xs = a.asInstanceOf[ArrayData]
    val ys = b.asInstanceOf[ArrayData]
    val n = math.min(xs.numElements(), ys.numElements())
    var sum = 0L
    var i = 0
    while (i < n) {
      if (!xs.isNullAt(i) && !ys.isNullAt(i)) {
        sum += DotFp9.roundHalfAway(
          xs.getFloat(i).toDouble * ys.getFloat(i).toDouble * 1e9)
      }
      i += 1
    }
    sum
  }

  /** True when neither input can contain null ELEMENTS — enables the
    * bulk-copy fast path (toFloatArray is a single memory copy for
    * UnsafeArrayData; the primitive loop then has no virtual accessor or
    * null check per element). Callers get onto this path by compacting
    * the vector column once per ROW (array_compact flips containsNull to
    * false), which is amortized over millions of per-PAIR evaluations. */
  private def elementsNonNull: Boolean = (left.dataType, right.dataType) match {
    case (ArrayType(_, ln), ArrayType(_, rn)) => !ln && !rn
    case _ => false
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val sum = ctx.freshName("sum")
      val p = ctx.freshName("p")
      if (elementsNonNull) {
        val xs = ctx.freshName("xs")
        val ys = ctx.freshName("ys")
        s"""
           |float[] $xs = $a.toFloatArray();
           |float[] $ys = $b.toFloatArray();
           |int $n = java.lang.Math.min($xs.length, $ys.length);
           |long $sum = 0L;
           |for (int $i = 0; $i < $n; $i++) {
           |  double $p = ((double) $xs[$i]) * ((double) $ys[$i]) * 1e9;
           |  $sum += graft.functions.DotFp9.roundHalfAway($p);
           |}
           |${ev.value} = $sum;
         """.stripMargin
      } else {
        s"""
           |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
           |long $sum = 0L;
           |for (int $i = 0; $i < $n; $i++) {
           |  if (!$a.isNullAt($i) && !$b.isNullAt($i)) {
           |    double $p = ((double) $a.getFloat($i)) * ((double) $b.getFloat($i)) * 1e9;
           |    $sum += graft.functions.DotFp9.roundHalfAway($p);
           |  }
           |}
           |${ev.value} = $sum;
         """.stripMargin
      }
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotFp9 =
    copy(left = newLeft, right = newRight)
}

object DotFp9 {
  /** Round half away from zero — matches DuckDB `round(DOUBLE)` and, on
    * every value that occurs off the knife edge, Spark's `round`. */
  def roundHalfAway(p: Double): Long =
    if (p >= 0d) math.floor(p + 0.5d).toLong else math.ceil(p - 0.5d).toLong
}
