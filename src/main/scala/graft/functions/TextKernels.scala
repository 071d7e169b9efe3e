package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen'd tokenization kernels — the scan-stage twin of the
  * [[HashExprs]] hashing kernels (r17 optimization round).
  *
  * Why: `TextOps.words` was `filter(split(text, " "), w => w != "")`
  * and the gram constructors were `zip_with(slice, slice, concat_ws)`
  * — `filter`/`zip_with` are HigherOrderFunctions, i.e.
  * `CodegenFallback`: every text query's scan stage evaluated them
  * INTERPRETED, one lambda invocation + variable binding per element
  * per row, plus a regex `split` and intermediate slice arrays. The
  * tokenize→gram pipeline measured ~1.4 ms/doc of single-thread CPU at
  * sf0.1 (x8's census stage) — the single largest CPU class across the
  * x/d text families. These kernels do one byte scan (words) / one
  * array pass (ngrams) per row inside whole-stage codegen.
  *
  * SEMANTICS ARE FROZEN by the DuckDB oracle gate: each kernel is
  * bit-identical to the HOF formulation it replaces, which stays in
  * `TextOps` as the executable spec (`wordsHof`/`bigrams2Hof`/
  * `shingles3Hof`), equivalence-pinned by the suite on adversarial
  * inputs (multi-space, unicode, empty/null elements, short arrays):
  *
  * - words: split on single 0x20 bytes, drop empty segments — exactly
  *   `filter(split(text, " "), _ != "")` (the " " regex is a literal;
  *   a 0x20 byte never occurs inside a multi-byte UTF-8 sequence, so
  *   the byte scan is UTF-8-safe). Null text → null.
  * - ngrams(n ∈ {2,3}): position i joins elements i..i+n-1 with " ",
  *   null elements skipped EXACTLY as nested `concat_ws` does (the
  *   3-gram is concat_ws(" ", a, concat_ws(" ", b, c)) — an all-null
  *   tail contributes an EMPTY STRING to the outer join, reproducing
  *   the HOF's trailing-space artifact on null-bearing inputs).
  *   Arrays shorter than n — and NULL input arrays, because
  *   `when(size(null) >= n)` falls to otherwise — yield the EMPTY
  *   array, never null.
  */
object TextKernels {

  /** One-pass whitespace(0x20) tokenizer; see object scaladoc. */
  def splitWords(s: UTF8String): ArrayData = {
    val bytes = s.getBytes
    val n = bytes.length
    val out = new java.util.ArrayList[Object](8)
    var start = 0
    var i = 0
    while (i <= n) {
      if (i == n || bytes(i) == 0x20.toByte) {
        if (i > start)
          out.add(UTF8String.fromBytes(bytes, start, i - start))
        start = i + 1
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  private val Sep = UTF8String.fromString(" ")

  /** Adjacent word n-gram join (n = 2 or 3) mirroring the nested
    * concat_ws evaluation order; null input → empty (the
    * `when(size(null) >= n)` → otherwise contract). See object
    * scaladoc. */
  def wordNgrams(ws: ArrayData, n: Int): ArrayData = {
    if (ws == null) return Empty
    val len = ws.numElements()
    if (len < n) return TextKernels.Empty
    val out = new Array[Any](len - n + 1)
    var i = 0
    while (i <= len - n) {
      val a = if (ws.isNullAt(i)) null else ws.getUTF8String(i)
      val b = if (ws.isNullAt(i + 1)) null else ws.getUTF8String(i + 1)
      val g =
        if (n == 2) UTF8String.concatWs(Sep, a, b)
        else {
          val c = if (ws.isNullAt(i + 2)) null else ws.getUTF8String(i + 2)
          // inner join first: concat_ws never returns null, so an
          // all-null (b, c) contributes "" to the outer join — the
          // exact HOF nesting
          UTF8String.concatWs(Sep, a, UTF8String.concatWs(Sep, b, c))
        }
      out(i) = g
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Sliding/strided word-window joins — the x35/d19/x15 window
    * constructor (`transform(sequence(...), p => array_join(slice(ws,
    * p·stride+1, width), " "))`) as one array pass. `fullOnly = true`
    * emits only starts with a complete `width`-element window (the
    * overlapping-substring form, starts 0..n−width); `fullOnly = false`
    * emits ceil(n/stride) windows with the tail truncated (the
    * non-overlapping segment form). Null elements are skipped by the
    * joiner with NO extra separator — exactly `array_join(..., " ")`.
    * Null or empty input → empty array (the callers' `when(size(ws)
    * ...)` otherwise-branch). */
  def wordWindows(ws: ArrayData, width: Int, stride: Int,
      fullOnly: Boolean): ArrayData = {
    if (ws == null) return Empty
    val n = ws.numElements()
    val count =
      if (fullOnly) (if (n < width) 0 else (n - width) / stride + 1)
      else (n + stride - 1) / stride
    if (count <= 0) return Empty
    val out = new Array[Any](count)
    val sb = new java.lang.StringBuilder(64)
    var w = 0
    while (w < count) {
      val start = w * stride
      val end = math.min(start + width, n)
      sb.setLength(0)
      var i = start
      var first = true
      while (i < end) {
        if (!ws.isNullAt(i)) {
          if (!first) sb.append(' ')
          sb.append(ws.getUTF8String(i).toString)
          first = false
        }
        i += 1
      }
      out(w) = UTF8String.fromString(sb.toString)
      w += 1
    }
    new GenericArrayData(out)
  }

  private val Empty = new GenericArrayData(Array.empty[Any])
}

/** array<string> → array<string> of width-`width` stride-`stride`
  * word-window joins; see [[TextKernels.wordWindows]]. Null input →
  * empty array (never null). */
case class WordWindowsExpr(child: Expression, width: Int, stride: Int,
    fullOnly: Boolean) extends UnaryExpression {
  require(width >= 1 && stride >= 1, "width and stride must be positive")
  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"word_windows requires array<string>, got ${t.sql}")
    }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "word_windows"
  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any =
    TextKernels.wordWindows(
      child.eval(input).asInstanceOf[ArrayData], width, stride, fullOnly)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    import org.apache.spark.sql.catalyst.expressions.codegen.{CodeGenerator, FalseLiteral}
    val c = child.genCode(ctx)
    val javaType = CodeGenerator.javaType(dataType)
    ev.copy(
      code = code"""
        ${c.code}
        $javaType ${ev.value} = graft.functions.TextKernels.wordWindows(
          ${c.isNull} ? null : ${c.value}, $width, $stride, $fullOnly);
        """,
      isNull = FalseLiteral)
  }
  override protected def withNewChildInternal(c: Expression): WordWindowsExpr =
    copy(child = c)
}

/** string → array<string> of non-empty space-separated tokens;
  * null input → null. See [[TextKernels.splitWords]]. */
case class SplitWordsExpr(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"split_words requires string, got ${t.sql}")
    }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "split_words"
  override def nullSafeEval(a: Any): Any =
    TextKernels.splitWords(a.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev,
      c => s"${ev.value} = graft.functions.TextKernels.splitWords($c);")
  override protected def withNewChildInternal(c: Expression): SplitWordsExpr =
    copy(child = c)
}

/** array<string> → array<string> of adjacent n-gram joins (n ∈ {2,3});
  * input shorter than n — or NULL — yields the empty array (the
  * `when(size(ws) >= n)...otherwise(array())` contract).
  * See [[TextKernels.wordNgrams]]. */
case class WordNgramsExpr(child: Expression, n: Int) extends UnaryExpression {
  require(n == 2 || n == 3, s"word_ngrams supports n = 2 or 3, got $n")
  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"word_ngrams requires array<string>, got ${t.sql}")
    }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "word_ngrams"
  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any =
    TextKernels.wordNgrams(
      child.eval(input).asInstanceOf[ArrayData], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    import org.apache.spark.sql.catalyst.expressions.codegen.{CodeGenerator, FalseLiteral}
    val c = child.genCode(ctx)
    val javaType = CodeGenerator.javaType(dataType)
    ev.copy(
      code = code"""
        ${c.code}
        $javaType ${ev.value} = graft.functions.TextKernels.wordNgrams(
          ${c.isNull} ? null : ${c.value}, $n);
        """,
      isNull = FalseLiteral)
  }
  override protected def withNewChildInternal(c: Expression): WordNgramsExpr =
    copy(child = c)
}
