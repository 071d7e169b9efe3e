package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Integer dot product of two long vectors as a native Catalyst
  * expression with whole-stage codegen — the quantized-ANN twin of
  * [[DotFp9]].
  *
  * Semantics (must stay bit-identical to the HOF formulation in
  * `operators.Similarity.qdotHof` and the DuckDB oracle):
  * `sum_i a[i] * b[i]` over the shorter length, accumulated in Long;
  * null *elements* contribute 0; null arrays yield null (standard
  * BinaryExpression null-intolerance). Callers own overflow: the
  * int8-quantized domain (|v| ≤ 127) keeps |sum| ≤ 127²·dim, far from
  * Long range for any real dimensionality, and Java's wrapping `*`/`+`
  * never throws where an ANSI-mode HOF would.
  *
  * Why a custom expression: s5's quantized kNN is pitched as THE
  * stored form of a 100 TB ANN corpus, which makes its scoring loop
  * the hot path by definition — and the equivalent
  * `aggregate(zip_with(a, b, _*_), 0L, _+_)` runs interpreted, two
  * lambda invocations per element per pair plus an intermediate array.
  * This compiles to a tight primitive loop inside the generated join
  * stage, same as [[DotFp9]] on the float path.
  */
case class DotI64(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"dot_i64 requires two array<bigint> inputs, got ${l.sql} and ${r.sql}")
    }

  override def dataType: DataType = LongType

  override def prettyName: String = "dot_i64"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val xs = a.asInstanceOf[ArrayData]
    val ys = b.asInstanceOf[ArrayData]
    val n = math.min(xs.numElements(), ys.numElements())
    var sum = 0L
    var i = 0
    while (i < n) {
      if (!xs.isNullAt(i) && !ys.isNullAt(i)) {
        sum += xs.getLong(i) * ys.getLong(i)
      }
      i += 1
    }
    sum
  }

  /** Same bulk-copy fast path as [[DotFp9]]: when neither input can
    * contain null elements, toLongArray is a single memory copy and the
    * loop has no per-element null check. */
  private def elementsNonNull: Boolean = (left.dataType, right.dataType) match {
    case (ArrayType(_, ln), ArrayType(_, rn)) => !ln && !rn
    case _ => false
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val sum = ctx.freshName("sum")
      if (elementsNonNull) {
        val xs = ctx.freshName("xs")
        val ys = ctx.freshName("ys")
        s"""
           |long[] $xs = $a.toLongArray();
           |long[] $ys = $b.toLongArray();
           |int $n = java.lang.Math.min($xs.length, $ys.length);
           |long $sum = 0L;
           |for (int $i = 0; $i < $n; $i++) {
           |  $sum += $xs[$i] * $ys[$i];
           |}
           |${ev.value} = $sum;
         """.stripMargin
      } else {
        s"""
           |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
           |long $sum = 0L;
           |for (int $i = 0; $i < $n; $i++) {
           |  if (!$a.isNullAt($i) && !$b.isNullAt($i)) {
           |    $sum += $a.getLong($i) * $b.getLong($i);
           |  }
           |}
           |${ev.value} = $sum;
         """.stripMargin
      }
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotI64 =
    copy(left = newLeft, right = newRight)
}
