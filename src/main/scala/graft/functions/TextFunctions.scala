package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, StringType}

/** Column-level text primitives for the training-data pipeline operators
  * (dedup, quality scoring, language ID, fingerprinting).
  *
  * Everything here is built from `org.apache.spark.sql.functions`
  * (codegen'd, whole-stage-compatible) — no UDFs — so plans over 100 TB
  * of documents stay inside WholeStageCodegen and push projections to
  * the scan.
  *
  * Cross-engine note: these are mirrored 1:1 by DuckDB SQL in the oracle
  * queries; tokenization is `split(trim(x), '\s+')` on both sides.
  */
object TextFunctions {

  /** Whitespace tokenization. Empty/blank input → empty array. */
  def toks(c: Column): Column =
    when(length(trim(c)) === 0, array().cast(ArrayType(StringType)))
      .otherwise(split(trim(c), "\\s+"))

  /** Lower-cased whitespace tokens. */
  def normToks(c: Column): Column = toks(lower(c))

  def tokenCount(c: Column): Column = size(toks(c))

  /** Word k-shingles: overlapping k-grams of the token array, joined by
    * single spaces. Fewer than k tokens → empty array (guarded because
    * `sequence(1, n)` with n<1 would generate a descending range).
    */
  def shingles(tokens: Column, k: Int): Column =
    when(size(tokens) < k, array().cast(ArrayType(StringType)))
      .otherwise(transform(
        sequence(lit(1), size(tokens) - (k - 1)),
        i => concat_ws(" ", slice(tokens, i, lit(k)))))

  /** One MinHash signature: the lexicographic minimum of salted md5 over
    * a *set* of shingles. With k independent salts this is the classic
    * k-permutation MinHash (md5 as the permutation family); string-min
    * over hex digests is order-stable across engines.
    * Use over an exploded shingle column inside a groupBy(id).
    */
  def minhashAgg(shingle: Column, salt: Int): Column =
    min(md5(concat(lit(s"s$salt|"), shingle)))

  /** Count of occurrences of `word` in a token array. */
  def occurrences(tokens: Column, word: String): Column =
    size(filter(tokens, x => x === lit(word)))

  /** Sorted-distinct-token document fingerprint (the classic "shingle
    * fingerprint" for near-dup detection under word reordering).
    * One codegen'd pass — equivalent to
    * `md5(concat_ws(" ", array_sort(array_distinct(normToks(c)))))`
    * but without the interpreted array_sort/array_distinct pair.
    */
  def sortedTokenFingerprint(c: Column): Column =
    graft.expressions.VectorExpressions.sortedTokenFpN(normToks(c))

  /** Nibble value (0-15) of hex digit `j` (0-based) of an md5 hex string.
    * Built on instr so the identical expression runs in DuckDB.
    */
  def hexDigit(h: Column, j: Int): Column =
    instr(lit("0123456789abcdef"), substring(h, j + 1, 1)) - 1

  /** SimHash over word unigrams, `bits` ≤ 32 bits. Bit j of a word's
    * hash is the parity of hex digit j of md5(word); the document bit is
    * the sign of the sum of ±1 votes over all word occurrences.
    * Aggregate: use over an exploded token column inside groupBy(id).
    */
  def simhashVote(wordMd5: Column, j: Int): Column =
    sum(when(hexDigit(wordMd5, j) % 2 === 1, 1).otherwise(-1))

  def simhashFromVotes(votes: Seq[Column]): Column =
    votes.zipWithIndex.map { case (v, j) =>
      when(v > 0, lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)
}
