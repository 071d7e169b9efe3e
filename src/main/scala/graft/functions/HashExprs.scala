package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen'd hashing kernels for the dedup/fingerprint pipeline.
  *
  * Same rationale as [[DotFp9]]: the higher-order-function formulations
  * in `operators.TextOps` run interpreted — a lambda invocation and an
  * intermediate allocation per array element per row — and at sf0.1 the
  * interpreter overhead dominates the md5 arithmetic itself (measured
  * 3–5 s/query; these kernels take the same pipelines to well under a
  * second). Each expression's `doGenCode` emits one call into a static
  * JIT-compiled kernel, so the surrounding stage stays in whole-stage
  * codegen and the per-row work is a tight primitive loop.
  *
  * SEMANTICS ARE FROZEN by the DuckDB oracle gate: each kernel must
  * produce bit-identical output to the HOF formulation it replaces
  * (kept in `TextOps` as the executable spec, exercised by the suite).
  */
object HashExprs {

  private val md5Local = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  private def md5(bytes: Array[Byte]): Array[Byte] = {
    val m = md5Local.get(); m.reset(); m.digest(bytes)
  }

  /** Per element: first 8 lowercase-hex chars of md5(s) as a BIGINT =
    * first 4 digest bytes, big-endian unsigned. Null elements map to
    * null elements. Mirrors `TextOps.shingleHash32`. */
  def shingleHash32(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    val out = new Array[Any](n)
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val d = md5(arr.getUTF8String(i).getBytes)
        out(i) = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
          ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  /** 32-bit SimHash bit string over raw words: counter j accumulates +1
    * if hex nibble j of md5(word) is >= 8 else −1 (null word → −1, the
    * `when(...).otherwise(-1)` behavior); bit j = counter >= 0. Mirrors
    * `TextOps.wordMd5s` + `TextOps.simhash32FromMd5s` without ever
    * materializing the hex strings. */
  def simHash32(ws: ArrayData): UTF8String = {
    val counts = new Array[Int](32)
    val n = ws.numElements()
    var i = 0
    while (i < n) {
      if (!ws.isNullAt(i)) {
        val d = md5(ws.getUTF8String(i).getBytes)
        var j = 0
        while (j < 32) {
          val b = d(j >> 1) & 0xff
          val nib = if ((j & 1) == 0) b >> 4 else b & 0xf
          counts(j) += (if (nib >= 8) 1 else -1)
          j += 1
        }
      } else {
        var j = 0
        while (j < 32) { counts(j) -= 1; j += 1 }
      }
      i += 1
    }
    val cs = new Array[Char](32)
    var j = 0
    while (j < 32) { cs(j) = if (counts(j) >= 0) '1' else '0'; j += 1 }
    UTF8String.fromString(new String(cs))
  }

  /** MinHash signature from staged base hashes: element i = min over
    * non-null h of (a(i)·h + b(i)) mod p; null when the array is empty
    * or all-null (array_min semantics). Mirrors
    * `TextOps.minhashFromHashes`. */
  def minHashSig(hh: ArrayData, a: Array[Long], b: Array[Long], p: Long): ArrayData = {
    val k = a.length
    val n = hh.numElements()
    val out = new Array[Any](k)
    var i = 0
    while (i < k) {
      var best = Long.MaxValue
      var seen = false
      var t = 0
      while (t < n) {
        if (!hh.isNullAt(t)) {
          val v = (a(i) * hh.getLong(t) + b(i)) % p
          if (v < best) best = v
          seen = true
        }
        t += 1
      }
      if (seen) out(i) = best
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Lexicographic min of md5 hex digests over non-null elements (null
    * when empty/all-null). Lowercase hex order = unsigned digest-byte
    * order, so the min is tracked on raw digests and hex-encoded once.
    * Mirrors `array_min(transform(sh, md5))`. */
  def minMd5(sh: ArrayData): UTF8String = {
    var best: Array[Byte] = null
    val n = sh.numElements()
    var i = 0
    while (i < n) {
      if (!sh.isNullAt(i)) {
        val d = md5(sh.getUTF8String(i).getBytes)
        if (best == null || unsignedLess(d, best)) best = d
      }
      i += 1
    }
    if (best == null) null else UTF8String.fromString(hexLower(best))
  }

  private def unsignedLess(x: Array[Byte], y: Array[Byte]): Boolean = {
    var i = 0
    while (i < x.length) {
      val c = (x(i) & 0xff) - (y(i) & 0xff)
      if (c != 0) return c < 0
      i += 1
    }
    false
  }

  private def hexLower(d: Array[Byte]): String = {
    val digits = "0123456789abcdef"
    val cs = new Array[Char](d.length * 2)
    var i = 0
    while (i < d.length) {
      cs(2 * i) = digits((d(i) >> 4) & 0xf)
      cs(2 * i + 1) = digits(d(i) & 0xf)
      i += 1
    }
    new String(cs)
  }
}

/** Base trait: unary array<string> (or array<long>) kernel expression
  * whose codegen is a single static-kernel call. */
sealed trait HashKernelExpr extends UnaryExpression {
  protected def kernelCall(childVar: String): String
  protected def requiredElemType: DataType

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(t, _) if t == requiredElemType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<${requiredElemType.simpleString}>, got ${t.sql}")
    }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = ${kernelCall(c)};")
}

/** array<string> → array<long>: see [[HashExprs.shingleHash32]]. */
case class ShingleHash32Expr(child: Expression) extends HashKernelExpr {
  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def prettyName: String = "shingle_hash32"
  override protected def requiredElemType: DataType = StringType
  override def nullSafeEval(a: Any): Any =
    HashExprs.shingleHash32(a.asInstanceOf[ArrayData])
  override protected def kernelCall(c: String): String =
    s"graft.functions.HashExprs.shingleHash32($c)"
  override protected def withNewChildInternal(c: Expression): ShingleHash32Expr =
    copy(child = c)
}

/** array<string> words → 32-char '0'/'1' string: see [[HashExprs.simHash32]]. */
case class SimHash32Expr(child: Expression) extends HashKernelExpr {
  override def dataType: DataType = StringType
  override def prettyName: String = "simhash32"
  override protected def requiredElemType: DataType = StringType
  override def nullSafeEval(a: Any): Any =
    HashExprs.simHash32(a.asInstanceOf[ArrayData])
  override protected def kernelCall(c: String): String =
    s"graft.functions.HashExprs.simHash32($c)"
  override protected def withNewChildInternal(c: Expression): SimHash32Expr =
    copy(child = c)
}

/** array<string> → min md5 hex string (nullable): see [[HashExprs.minMd5]]. */
case class MinMd5Expr(child: Expression) extends HashKernelExpr {
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "min_md5"
  override protected def requiredElemType: DataType = StringType
  override def nullSafeEval(a: Any): Any =
    HashExprs.minMd5(a.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
       |${ev.value} = graft.functions.HashExprs.minMd5($c);
       |${ev.isNull} = ${ev.value} == null;
     """.stripMargin)
  override protected def kernelCall(c: String): String = "" // unused
  override protected def withNewChildInternal(c: Expression): MinMd5Expr =
    copy(child = c)
}

/** array<long> staged hashes → array<long> MinHash signature with the
  * universal-hash coefficient family baked in: see [[HashExprs.minHashSig]]. */
case class MinHashSigExpr(child: Expression, a: Seq[Long], b: Seq[Long], p: Long)
    extends UnaryExpression {
  require(a.length == b.length, "coefficient arrays must align")

  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def prettyName: String = "minhash_sig"

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<bigint>, got ${t.sql}")
    }

  private lazy val aArr = a.toArray
  private lazy val bArr = b.toArray

  override def nullSafeEval(x: Any): Any =
    HashExprs.minHashSig(x.asInstanceOf[ArrayData], aArr, bArr, p)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aRef = ctx.addReferenceObj("mhA", aArr, "long[]")
    val bRef = ctx.addReferenceObj("mhB", bArr, "long[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.HashExprs.minHashSig($c, $aRef, $bRef, ${p}L);")
  }

  override protected def withNewChildInternal(c: Expression): MinHashSigExpr =
    copy(child = c)
}
