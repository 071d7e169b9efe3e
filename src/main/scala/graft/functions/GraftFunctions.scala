package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge, SparkSession}

/** DataFrame + SQL surface for graft's native Catalyst expressions. */
object GraftFunctions {

  /** Fixed-point (1e9) dot product of two `array<float>` columns —
    * codegen'd; see [[DotFp9]]. */
  def dot_fp9(a: Column, b: Column): Column =
    GraftSqlBridge.column(
      DotFp9(GraftSqlBridge.expression(a), GraftSqlBridge.expression(b)))

  /** Integer dot product of two `array<bigint>` columns — codegen'd;
    * see [[DotI64]]. */
  def dot_i64(a: Column, b: Column): Column =
    GraftSqlBridge.column(
      DotI64(GraftSqlBridge.expression(a), GraftSqlBridge.expression(b)))

  /** array<string> → array<long>: 32-bit md5-prefix hash per element —
    * codegen'd; see [[ShingleHash32Expr]]. */
  def shingle_hash32(sh: Column): Column =
    GraftSqlBridge.column(ShingleHash32Expr(GraftSqlBridge.expression(sh)))

  /** array<string> words → 32-bit SimHash '0'/'1' string — codegen'd;
    * see [[SimHash32Expr]]. */
  def simhash32(ws: Column): Column =
    GraftSqlBridge.column(SimHash32Expr(GraftSqlBridge.expression(ws)))

  /** array<string> → min md5 hex digest — codegen'd; see [[MinMd5Expr]]. */
  def min_md5(sh: Column): Column =
    GraftSqlBridge.column(MinMd5Expr(GraftSqlBridge.expression(sh)))

  /** array<long> staged hashes → MinHash signature under the (a, b, p)
    * universal-hash family — codegen'd; see [[MinHashSigExpr]]. */
  def minhash_sig(hh: Column, a: Seq[Long], b: Seq[Long], p: Long): Column =
    GraftSqlBridge.column(MinHashSigExpr(GraftSqlBridge.expression(hh), a, b, p))

  /** Count-Min Sketch AGGREGATE over a staged `array<bigint>` of
    * depth row-hashes → flat depth·width counter array; native
    * `TypedImperativeAggregate` with partial aggregation; see
    * [[CmsAggExpr]]. */
  def cms_sketch(hashes: Column, depth: Int, width: Int): Column =
    GraftSqlBridge.column(
      CmsAggExpr(GraftSqlBridge.expression(hashes), depth, width)
        .toAggregateExpression())

  /** WEIGHTED [[cms_sketch]] (r18): one update per (key, count) row —
    * each counter gains `weight` instead of 1. Bit-identical to the
    * per-occurrence form over the expanded stream (integer-sum
    * commutativity; spec-pinned), at 1/mean-frequency of the hashing
    * cost. See [[CmsAggExpr]]. */
  def cms_sketch_weighted(hashes: Column, weight: Column,
      depth: Int, width: Int): Column =
    GraftSqlBridge.column(
      CmsAggExpr(GraftSqlBridge.expression(hashes), depth, width,
        GraftSqlBridge.expression(weight))
        .toAggregateExpression())

  /** HyperLogLog AGGREGATE over a staged 60-bit BIGINT row hash →
    * m register maxima; native `TypedImperativeAggregate` whose
    * elementwise-MAX merge is duplicate-insensitive; see
    * [[HllAggExpr]]. */
  def hll_sketch(hash: Column, m: Int): Column =
    GraftSqlBridge.column(
      HllAggExpr(GraftSqlBridge.expression(hash), m)
        .toAggregateExpression())

  /** Bloom filter AGGREGATE over a staged `array<bigint>` of k bit
    * positions → m bits packed into m/64 longs; native
    * `TypedImperativeAggregate` whose elementwise-OR merge is
    * duplicate-insensitive; see [[BloomAggExpr]]. */
  def bloom_sketch(positions: Column, m: Int): Column =
    GraftSqlBridge.column(
      BloomAggExpr(GraftSqlBridge.expression(positions), m)
        .toAggregateExpression())

  /** K-Minimum-Values distinct sketch AGGREGATE over a staged md5-hex
    * string → ascending array of the ≤k smallest distinct values;
    * native `TypedImperativeAggregate` whose k-min merge is
    * duplicate-insensitive and supports set operations (union /
    * Jaccard / intersection estimates) downstream; see [[KmvAggExpr]]. */
  def kmv_sketch(hash: Column, k: Int): Column =
    GraftSqlBridge.column(
      KmvAggExpr(GraftSqlBridge.expression(hash), k)
        .toAggregateExpression())

  /** Banded Levenshtein with a PER-ROW threshold column: Spark's
    * public `levenshtein(l, r, threshold: Int)` only takes a literal
    * band, but the underlying Catalyst expression's threshold is an
    * arbitrary per-row Expression (codegen'd, `genCodeWithThreshold`)
    * — so a length-relative band (d23's production posture) costs the
    * same banded O(threshold·min_len) per pair. Returns the exact
    * distance when ≤ threshold, −1 past it (the built-in's contract). */
  def levenshtein_banded(l: Column, r: Column, threshold: Column): Column =
    GraftSqlBridge.column(
      org.apache.spark.sql.catalyst.expressions.Levenshtein(
        GraftSqlBridge.expression(l), GraftSqlBridge.expression(r),
        Some(GraftSqlBridge.expression(threshold.cast("int")))))

  /** string → Unicode-NFC-normalized string — codegen'd with an
    * ASCII zero-allocation fast path; see [[NfcNormalizeExpr]]. */
  def nfc(s: Column): Column =
    GraftSqlBridge.column(NfcNormalizeExpr(GraftSqlBridge.expression(s)))

  /** string → array<string> whitespace tokens (empties dropped) —
    * codegen'd one-pass byte scan; see [[SplitWordsExpr]]. */
  def split_words(s: Column): Column =
    GraftSqlBridge.column(SplitWordsExpr(GraftSqlBridge.expression(s)))

  /** array<string> → adjacent n-gram joins (n = 2 or 3) — codegen'd;
    * see [[WordNgramsExpr]]. */
  def word_ngrams(ws: Column, n: Int): Column =
    GraftSqlBridge.column(WordNgramsExpr(GraftSqlBridge.expression(ws), n))

  /** array<string> → width/stride word-window joins — codegen'd; see
    * [[WordWindowsExpr]]. */
  def word_windows(ws: Column, width: Int, stride: Int,
      fullOnly: Boolean): Column =
    GraftSqlBridge.column(
      WordWindowsExpr(GraftSqlBridge.expression(ws), width, stride, fullOnly))

  /** (bigint, bigint) → bigint Morton locality code over the low 16
    * bits of each dimension — codegen'd; see [[ZOrder16Expr]]. */
  def zorder16(a: Column, b: Column): Column =
    GraftSqlBridge.column(
      ZOrder16Expr(GraftSqlBridge.expression(a), GraftSqlBridge.expression(b)))

  /** Register graft functions into a session's catalog so `spark.sql`
    * text can call them by name. Idempotent. (`minhash_sig` carries
    * non-expression coefficient parameters, so it stays DataFrame-only.) */
  def register(spark: SparkSession): Unit = {
    GraftSqlBridge.registerFunction(
      spark, "dot_fp9", children => DotFp9(children(0), children(1)),
      classOf[DotFp9])
    GraftSqlBridge.registerFunction(
      spark, "dot_i64", children => DotI64(children(0), children(1)),
      classOf[DotI64])
    GraftSqlBridge.registerFunction(
      spark, "shingle_hash32", children => ShingleHash32Expr(children(0)),
      classOf[ShingleHash32Expr])
    GraftSqlBridge.registerFunction(
      spark, "simhash32", children => SimHash32Expr(children(0)),
      classOf[SimHash32Expr])
    GraftSqlBridge.registerFunction(
      spark, "min_md5", children => MinMd5Expr(children(0)),
      classOf[MinMd5Expr])
    GraftSqlBridge.registerFunction(
      spark, "zorder16", children => ZOrder16Expr(children(0), children(1)),
      classOf[ZOrder16Expr])
    GraftSqlBridge.registerFunction(
      spark, "nfc", children => NfcNormalizeExpr(children(0)),
      classOf[NfcNormalizeExpr])
    GraftSqlBridge.registerFunction(
      spark, "split_words", children => SplitWordsExpr(children(0)),
      classOf[SplitWordsExpr])
  }
}
