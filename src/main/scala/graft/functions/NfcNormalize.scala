package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization as a native Catalyst expression with
  * whole-stage codegen — the canonical-composition step every text
  * pipeline runs before hashing/dedup (a decomposed "é" (e +
  * U+0301) and the composed "é" (U+00E9) must fingerprint, shingle,
  * and dedup identically, or visually-equal documents silently escape
  * every content-addressed stage: x4 fingerprints, d1 exact dedup,
  * d2/d3 MinHash, x11/x21 decontamination).
  *
  * Why a custom expression: Spark has no NFC builtin (DuckDB has
  * `nfc_normalize`, the oracle side), and a Scala UDF would pay
  * serialization + break whole-stage codegen in the middle of the
  * narrow normalize→hash chains this engine stages. The kernel
  * delegates to `java.text.Normalizer` with an `isNormalized` fast
  * path: ASCII and already-composed text (the overwhelming common
  * case at corpus scale) short-circuits with a cheap scan and ZERO
  * allocation — the original UTF8String is returned as-is.
  *
  * Engine parity note: the JDK and ICU (DuckDB) both implement
  * Unicode canonical composition; outputs agree on conformant input
  * (the spec pins composed/decomposed Latin, Hangul LV/LVT
  * composition and compatibility NON-changes; the oracle gate runs
  * both engines over the corpus).
  */
case class NfcNormalizeExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case _: StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"nfc requires a string input, got ${t.sql}")
    }

  override def dataType: DataType = child.dataType

  override def prettyName: String = "nfc"

  override def nullSafeEval(s: Any): Any =
    NfcNormalizeExpr.nfc(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.NfcNormalizeExpr.nfc($c);")

  override protected def withNewChildInternal(c: Expression): NfcNormalizeExpr =
    copy(child = c)
}

object NfcNormalizeExpr {
  /** NFC-normalize a UTF8String; returns the INPUT object unchanged
    * when already normalized. Pure-ASCII input (the dominant case at
    * corpus scale) is detected on the raw bytes with ZERO allocation;
    * non-ASCII pays one String round-trip only when actually needed. */
  def nfc(s: UTF8String): UTF8String = {
    if (s.isFullAscii) return s
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }
}
