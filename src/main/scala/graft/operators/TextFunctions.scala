package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Shared text/hash column builders for the training-data operators
  * (dedup, text analysis, fingerprinting).
  *
  * Cross-engine determinism: every hash is derived from md5 — identical
  * in any engine — truncated to 60 bits (fits a signed 64-bit int in
  * both Spark and DuckDB). All functions are built-in compositions, so
  * they stay inside whole-stage codegen; md5 is the only non-trivial
  * kernel and is a single JVM intrinsic call per value.
  */
object TextFunctions {

  /** Deterministic 60-bit hash: first 15 hex chars of md5.
    * DuckDB equivalent: `CAST('0x' || substr(md5(x),1,15) AS BIGINT)`.
    * Backed by the native [[graft.plans.Md5Hash60]] expression (no
    * hex-string round trip); [[hash60Composed]] is the built-in
    * composition it is value-identical to (pinned by test). */
  def hash60(c: Column): Column = graft.plans.Md5Hash60(c)

  /** Built-in-composition form of [[hash60]] (reference semantics). */
  def hash60Composed(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast(LongType)

  /** Seeded variant for minhash permutations. */
  def hash60Seeded(c: Column, seed: Int): Column =
    hash60(concat(lit(s"$seed:"), c))

  /** Whitespace tokens, empty-safe.
    * DuckDB: `list_filter(regexp_split_to_array(trim(x),'\s+'), t -> t <> '')`. */
  def tokens(c: Column): Column =
    filter(split(trim(c), "\\s+"), t => t =!= "")

  def tokenCount(c: Column): Column = size(tokens(c))

  /** Word n-gram shingles (space-joined), distinct. Guarded for short
    * docs (Spark's `sequence(1, n)` runs DESCENDING when n < 1). */
  def shingles(toks: Column, n: Int): Column = {
    val grams = transform(sequence(lit(1), size(toks) - (n - 1)),
      i => concat_ws(" ", slice(toks, i, lit(n))))
    array_distinct(when(size(toks) >= n, grams).otherwise(array()))
  }

  /** Rolling polynomial fingerprint over token hashes:
    * `h := (h*31 + hash60(tok)) mod 1e9+7`, left fold from 0.
    * Stays overflow-free in signed 64-bit: h*31 < 3.2e10, +2^60 < 2^63.
    * DuckDB: `list_reduce(list_prepend(0, hashes), ...)` (seed via
    * prepend — DuckDB's reduce seeds from the first element). */
  def rollingFingerprint(toks: Column): Column =
    aggregate(
      transform(toks, t => hash60(t)),
      lit(0L),
      (acc, h) => pmod(acc * 31 + h, lit(1000000007L)))
}
