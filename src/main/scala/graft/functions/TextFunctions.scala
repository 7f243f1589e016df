package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text primitives for the LLM-pipeline operators (dedup, language ID,
  * quality scoring, fingerprinting). All pure Catalyst column
  * expressions — tokenization and shingling stay inside whole-stage
  * codegen / Tungsten arrays; no UDFs.
  */
object TextFunctions {

  /** Whitespace tokenization (documents.text is single-space separated). */
  def tokens(text: Column): Column = split(text, " ")

  /** BPE-ish token count: runs of letters, runs of digits, or single
    * non-alphanumeric symbols — the shape of a byte-pair pre-tokenizer's
    * word splitter, portable between Java and RE2 regex dialects.
    */
  def regexTokenCount(text: Column): Column =
    regexp_count(text, lit("[a-z]+|[0-9]+|[^a-z0-9 ]"))

  /** Word n-gram shingles (default 3), e.g. ["a b c", "b c d", ...].
    * Empty when the document has fewer than n tokens.
    *
    * Built by zipping n shifted slices of the token array. The naive
    * form — element_at(toks, i+j) inside a transform lambda — evaluates
    * the `toks` child expression once per ELEMENT; when callers pass
    * `split(text)` (they all do), that re-tokenizes the document ~3×
    * per shingle. Slices reference the child once per ROW: n evals
    * total, measured ~10× faster on the shingle-heavy dedup plans.
    */
  def shingles(toks: Column, n: Int = 3): Column = {
    val outLen = size(toks) - (n - 1)
    val zipped = arrays_zip((0 until n).map(j => slice(toks, lit(j + 1), outLen)): _*)
    val fields = (0 until n).map(j => s"$j")
    when(size(toks) >= n,
      transform(zipped, s => concat_ws(" ", fields.map(f => s.getField(f)): _*)))
      .otherwise(array().cast("array<string>"))
  }

  /** Rolling polynomial fingerprint over the token stream:
    * fold h -> (h*31 + md5Int(token)) mod 1e9+7, left-to-right.
    * Order-sensitive by design (a permuted document fingerprints
    * differently), overflow-free (h*31+x < 3.3e10 << Long.Max).
    */
  def rollingFingerprint(toks: Column): Column =
    aggregate(
      transform(toks, w => Portable.md5Int(w)),
      lit(0L),
      (h, x) => (h * 31L + x) % 1000000007L)
}
