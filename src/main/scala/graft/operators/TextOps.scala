package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Shared text primitives for the LLM-data-pipeline operators (dedup,
  * fingerprinting, quality scoring). Everything here is a pure Catalyst
  * expression tree — no UDFs — so the whole pipeline stays inside
  * whole-stage codegen and distributes without serialization cliffs.
  *
  * STAGING RULE (performance-critical): never nest these combinators
  * into one Column tree (`minhashSig(shingles3(words(text)))`). Catalyst
  * does not common-subexpression-eliminate through lambda functions, so
  * an inlined `words(text)` re-splits the full text for every element of
  * every enclosing transform — measured 100–1000× blowups. Instead,
  * stage each level as its own projected column
  * (`select(... words ...)` → `select(... shingles3(col("ws")) ...)`):
  * a column reference is materialized once per row, and CollapseProject
  * deliberately refuses to merge projections whose aliases are
  * referenced multiple times by non-cheap expressions, so the staging
  * survives optimization.
  *
  * Determinism contract: every derived value is either an integer, a
  * string, or fixed-point (`*_e3`/`*_e6` suffix = value scaled by 10^3 /
  * 10^6 held in a BIGINT). Integer arithmetic is associative, so results
  * are independent of partitioning/accumulation order — identical on
  * local[32] and a 1000-executor cluster, and bit-comparable against any
  * other engine (the DuckDB oracle).
  */
object TextOps {

  /** Whitespace tokens, empty strings dropped. Native codegen'd
    * kernel ([[graft.functions.SplitWordsExpr]] — one byte scan, no
    * regex, no interpreted filter lambda); [[wordsHof]] is the
    * executable spec. */
  def words(text: Column): Column =
    graft.functions.GraftFunctions.split_words(text)

  /** Spec formulation of [[words]] — interpreted HOF (`filter` is
    * CodegenFallback), tested equivalent, never used in query paths. */
  def wordsHof(text: Column): Column =
    filter(split(text, " "), w => w =!= "")

  /** Word 3-gram shingles (the standard near-dup shingling unit).
    * Docs shorter than 3 words shingle to the empty array. Native
    * codegen'd kernel ([[graft.functions.WordNgramsExpr]] — one array
    * pass, no slice intermediates, no interpreted zip_with lambdas);
    * [[shingles3Hof]] is the executable spec. */
  def shingles3(ws: Column): Column =
    graft.functions.GraftFunctions.word_ngrams(ws, 3)

  /** Spec formulation of [[shingles3]] — interpreted HOF, tested
    * equivalent, never used in query paths.
    *
    * Shape matters here: zip_with over three SLICES of `ws`, never
    * element_at(ws, i) inside a transform lambda. HOF lambdas are
    * interpreted with no cross-invocation CSE, so a lambda that
    * captures `ws` re-evaluates the whole `ws` SUBTREE once per
    * element per reference — a caller passing `words(text)` inline
    * paid ~3·n re-tokenizations per doc (measured 29× on the x43
    * shingle stream). With slices, `ws` is evaluated a constant
    * number of times per ROW and the lambdas touch only their bound
    * arguments, so even inline composition stays linear. */
  def shingles3Hof(ws: Column): Column =
    when(size(ws) >= 3,
      zip_with(
        slice(ws, lit(1), size(ws) - 2),
        zip_with(slice(ws, lit(2), size(ws) - 2), slice(ws, lit(3), size(ws) - 2),
          (b, c) => concat_ws(" ", b, c)),
        (a, bc) => concat_ws(" ", a, bc)))
      .otherwise(array().cast("array<string>"))

  /** Word bigrams (repetition-signal unit — x8). Docs shorter than 2
    * words map to the empty array. Native codegen'd kernel;
    * [[bigrams2Hof]] is the executable spec. */
  def bigrams2(ws: Column): Column =
    graft.functions.GraftFunctions.word_ngrams(ws, 2)

  /** Spec formulation of [[bigrams2]] — interpreted HOF, tested
    * equivalent, never used in query paths. Same slice discipline as
    * [[shingles3Hof]]. */
  def bigrams2Hof(ws: Column): Column =
    when(size(ws) >= 2,
      zip_with(slice(ws, lit(1), size(ws) - 1), slice(ws, lit(2), size(ws) - 1),
        (a, b) => concat_ws(" ", a, b)))
      .otherwise(array().cast("array<string>"))

  /** Modulus for the MinHash universal-hash family: 2^31 − 1 (prime).
    * a·h + b with a < P, h < 2^32 stays under 2^63 — no BIGINT overflow
    * on either engine. */
  val MhP = 2147483647L

  /** Deterministic universal-hash coefficients, derived driver-side from
    * md5 and inlined as literals into both the Spark plan and the DuckDB
    * oracle SQL (same pattern as the s4 LSH plane weights). */
  private def mhSeed(tag: String, i: Int): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s"$tag|$i".getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.take(8), 16)
  }
  def mhA(i: Int): Long = mhSeed("A", i) % (MhP - 1) + 1
  def mhB(i: Int): Long = mhSeed("B", i) % MhP

  /** 32-bit base hash per shingle: the first 8 hex chars of md5(s) as a
    * BIGINT. One md5 per shingle — the k MinHash permutations derive
    * from this value arithmetically ([[minhashFromHashes]]), instead of
    * k fresh digests per shingle (k× the hashing cost, the dominant term
    * of the whole dedup pipeline). Native codegen'd kernel
    * ([[graft.functions.ShingleHash32Expr]]); [[shingleHash32Hof]] is
    * the executable spec. */
  def shingleHash32(sh: Column): Column =
    graft.functions.GraftFunctions.shingle_hash32(sh)

  /** Spec formulation of [[shingleHash32]] — interpreted HOF, tested
    * equivalent, never used in query paths. The nested transform stages
    * the md5 so the 8-char fold reads a computed string, not 8
    * re-digests. */
  def shingleHash32Hof(sh: Column): Column =
    transform(transform(sh, s => md5(s)), h =>
      aggregate(sequence(lit(1), lit(8)), lit(0L), (acc, i) => {
        val a = ascii(h.substr(i, lit(1))).cast("long")
        acc * 16L + when(a <= 57L, a - 48L).otherwise(a - 87L)
      }))

  /** MinHash signature from staged base hashes ([[shingleHash32]]):
    * element i is min over shingles of (a_i·h + b_i) mod P — the
    * classic universal-hash MinHash estimator, P(sig_a[i] == sig_b[i])
    * ≈ Jaccard(a, b). Native codegen'd kernel
    * ([[graft.functions.MinHashSigExpr]]); [[minhashFromHashesHof]] is
    * the executable spec. */
  def minhashFromHashes(hs: Column, k: Int): Column =
    graft.functions.GraftFunctions.minhash_sig(hs,
      (0 until k).map(mhA), (0 until k).map(mhB), MhP)

  /** Spec formulation of [[minhashFromHashes]] — interpreted HOF,
    * tested equivalent, never used in query paths. `hs` MUST be a
    * staged column reference: it is referenced k times, which is also
    * what stops CollapseProject from re-inlining the hash computation
    * per permutation. */
  def minhashFromHashesHof(hs: Column, k: Int): Column =
    array((0 until k).map { i =>
      array_min(transform(hs, h => (h * lit(mhA(i)) + lit(mhB(i))) % lit(MhP)))
    }: _*)

  /** LSH band keys over a MinHash signature: `bands` bands of `rows`
    * signature positions each, hashed to one key per band. Two docs are
    * near-dup candidates iff they agree on at least one full band. */
  def lshBands(sig: Column, bands: Int, rows: Int): Column =
    transform(sequence(lit(0), lit(bands - 1)), b =>
      md5(concat(b.cast("string"), lit("#"),
        array_join(transform(slice(sig, b * rows + 1, lit(rows)),
          v => v.cast("string")), ","))))

  /** md5 hex digest per word — stage this as its own column so each
    * word is hashed exactly once (see staging note below). */
  def wordMd5s(ws: Column): Column = transform(ws, w => md5(w))

  /** 32-bit SimHash as a '0'/'1' bit string, from pre-hashed words
    * ([[wordMd5s]]). Bit j is set iff the frequency-weighted majority of
    * word hashes have bit j set; the word hash bit is the top bit of hex
    * nibble j of md5(word) (md5 char >= '8'), a construction that is
    * exactly portable to any engine with md5 + substring. Hamming
    * distance between sigs ≈ 32·(1 − cosine of the docs'
    * word-frequency vectors).
    *
    * Single-pass fold: one traversal of the word array accumulating all
    * 32 bit-counters via zip_with. The per-bit formulation (32 separate
    * aggregates) re-evaluates the input array once per bit — and since
    * CollapseProject inlines a once-referenced staged md5 column, that
    * meant 32 md5 digests per word (measured ~7 s at sf0.1 vs <1 s). */
  def simhash32FromMd5s(md5s: Column): Column =
    array_join(
      transform(
        aggregate(md5s,
          array(Seq.fill(32)(lit(0L)): _*),
          (acc, h) => zip_with(acc,
            transform(sequence(lit(1), lit(32)), j =>
              when(h.substr(j, lit(1)) >= "8", 1L).otherwise(-1L)),
            (a, b) => a + b)),
        v => when(v >= 0L, "1").otherwise("0")),
      "")

  /** 32-bit SimHash over raw words — native codegen'd kernel
    * ([[graft.functions.SimHash32Expr]]), digesting each word once with
    * no intermediate hex-string array. [[wordMd5s]] +
    * [[simhash32FromMd5s]] is the executable spec (tested equivalent,
    * never used in query paths). */
  def simhash32(ws: Column): Column =
    graft.functions.GraftFunctions.simhash32(ws)

  /** Lexicographic-min md5 digest of an array — native codegen'd
    * ([[graft.functions.MinMd5Expr]]); spec: `array_min(transform(sh,
    * md5))` (lowercase-hex order = unsigned digest order). */
  def minMd5(sh: Column): Column =
    graft.functions.GraftFunctions.min_md5(sh)

  /** Normalized text for exact-dup hashing: lowercase, whitespace
    * collapsed — the cheap canonicalization every dedup pipeline runs
    * before content hashing. */
  def normText(text: Column): Column =
    lower(trim(regexp_replace(text, "\\s+", " ")))

  /** Floor integer division on BIGINT columns (DuckDB `//` parity).
    * Double division of exact small ints is correctly rounded, so the
    * floor is exact for the value ranges used here (|n| < 2^52). */
  def idiv(a: Column, b: Column): Column = floor(a / b).cast("long")

  /** Hamming distance between two equal-length '0'/'1' bit strings,
    * as a pure expression (no UDF). */
  def hamming(a: Column, b: Column, bits: Int): Column =
    aggregate(
      transform(sequence(lit(1), lit(bits)), j =>
        when(a.substr(j, lit(1)) =!= b.substr(j, lit(1)), 1L).otherwise(0L)),
      lit(0L), (acc, v) => acc + v)
}
