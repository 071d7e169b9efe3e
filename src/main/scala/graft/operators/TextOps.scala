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

  /** Whitespace tokens, empty strings dropped. */
  def words(text: Column): Column =
    filter(split(text, " "), w => w =!= "")

  /** Word 3-gram shingles (the standard near-dup shingling unit).
    * Docs shorter than 3 words shingle to the empty array. */
  def shingles3(ws: Column): Column =
    when(size(ws) >= 3,
      transform(sequence(lit(0), size(ws) - 3), i =>
        concat_ws(" ",
          element_at(ws, i + 1), element_at(ws, i + 2), element_at(ws, i + 3))))
      .otherwise(array().cast("array<string>"))

  /** MinHash signature of a shingle set: k independent hash permutations
    * simulated as md5(i || '|' || shingle); the signature element i is the
    * lexicographic min of the md5 hex strings, which orders identically
    * to the underlying 128-bit values. P(sig_a[i] == sig_b[i]) ≈
    * Jaccard(a, b) — the classic MinHash estimator. */
  def minhashSig(sh: Column, k: Int): Column =
    transform(sequence(lit(0), lit(k - 1)), i =>
      array_min(transform(sh, s => md5(concat(i.cast("string"), lit("|"), s)))))

  /** LSH band keys over a MinHash signature: `bands` bands of `rows`
    * signature positions each, hashed to one key per band. Two docs are
    * near-dup candidates iff they agree on at least one full band. */
  def lshBands(sig: Column, bands: Int, rows: Int): Column =
    transform(sequence(lit(0), lit(bands - 1)), b =>
      md5(concat(b.cast("string"), lit("#"),
        array_join(slice(sig, b * rows + 1, lit(rows)), ","))))

  /** md5 hex digest per word — stage this as its own column so each
    * word is hashed exactly once (see staging note below). */
  def wordMd5s(ws: Column): Column = transform(ws, w => md5(w))

  /** 32-bit SimHash as a '0'/'1' bit string, from pre-hashed words
    * ([[wordMd5s]]). Bit j is set iff the frequency-weighted majority of
    * word hashes have bit j set; the word hash bit is the top bit of hex
    * nibble j of md5(word) (md5 char >= '8'), a construction that is
    * exactly portable to any engine with md5 + substring. Hamming
    * distance between sigs ≈ 32·(1 − cosine of the docs'
    * word-frequency vectors). */
  def simhash32FromMd5s(md5s: Column): Column =
    array_join(
      transform(sequence(lit(1), lit(32)), j =>
        when(
          aggregate(md5s, lit(0L), (acc, h) =>
            acc + when(h.substr(j, lit(1)) >= "8", 1L).otherwise(-1L)) >= 0L,
          "1").otherwise("0")),
      "")

  /** Convenience composition of [[wordMd5s]] + [[simhash32FromMd5s]].
    * ONLY for single-use contexts — in query pipelines stage the md5
    * array as its own column first (staging note below). */
  def simhash32(ws: Column): Column = simhash32FromMd5s(wordMd5s(ws))

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
