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

  /** Feature-hashed bag-of-words embedding — the deterministic STUB
    * standing in for a model encoder (no model runtime in this
    * container; the SPARK-SIDE PLUMBING is the real deliverable:
    * array-column schema, strict fold order, cross-engine parity).
    * Component d = Σ over tokens t with `hash60(t) mod dim == d` of
    * `(hash60Seeded(t,1) mod 2001 − 1000)/1000` ∈ [−1,1], summed as a
    * STRICT sequential fold in token order, so the doubles are
    * bit-identical across engines (DuckDB mirrors with per-component
    * `list_reduce` — adding a non-matching token's 0.0 there is an
    * exact IEEE no-op, so per-slot and per-component folds agree
    * bit-for-bit; pinned in Round9OpsSpec against the per-dim
    * spelling). Swapping in a real encoder changes ONLY this function:
    * everything downstream (norms, cosine joins, LSH bucketing) is
    * representation-agnostic.
    *
    * Cost: md5 runs exactly TWICE per token (slot hash + weight hash)
    * — the `gramHashes` trick: per-token (slot, weight) structs are
    * built in ONE `transform` pass, then a single array-accumulator
    * fold adds each weight into its slot. The earlier per-dim spelling
    * repeated both md5s inside every one of `dim` components (16
    * md5s/token at dim=8) — this IS the hot path the moment anyone
    * scales the stub. */
  def hashEmbed(textCol: Column, dim: Int): Column =
    hashEmbedGrams(tokens(textCol), dim)

  /** [[hashEmbed]]'s fold over an EXPLICIT gram array — the reuse
    * point for non-whitespace feature spaces (e.g. the char-trigram
    * subword grams of [[tokenVector]]); same strict sequential fold,
    * same cross-engine determinism. */
  def hashEmbedGrams(gramsCol: Column, dim: Int): Column = {
    require(dim > 0 && dim <= 64, s"need 0 < dim <= 64, got $dim")
    val slotted = transform(gramsCol, t => struct(
      pmod(hash60(t), lit(dim.toLong)).cast("int").as("d"),
      ((pmod(hash60Seeded(t, 1), lit(2001L)) - 1000L).cast("double") / 1000.0)
        .as("w")))
    aggregate(slotted, array_repeat(lit(0.0), dim),
      (acc, p) => transform(acc, (x, i) =>
        when(i === p.getField("d"), x + p.getField("w")).otherwise(x)))
  }

  /** Subword TOKEN embedding — the fastText recipe (Bojanowski et al.
    * 2017): a token's vector is the [[hashEmbedGrams]] fold over the
    * char trigrams of the boundary-padded token `'<' + tok + '>'`
    * (padding guarantees ≥ 1 gram for any non-empty token and makes
    * prefix/suffix grams distinct from interior ones). Deterministic
    * stand-in for a per-token encoder: multiple non-zero components
    * per token (unlike a whole-token hash, whose single slot makes
    * every cosine ±1/0), morphology-sensitive, and replayable in the
    * oracle gram-for-gram. */
  def tokenVector(tokCol: Column, dim: Int): Column = {
    val padded = concat(lit("<"), tokCol, lit(">"))
    hashEmbedGrams(transform(
      sequence(lit(1), length(padded) - 2),
      i => padded.substr(i, lit(3))), dim)
  }

  /** The original per-dimension spelling of [[hashEmbed]] — kept ONLY
    * as the independent reference implementation for the value-
    * identity pin (Round9OpsSpec); it re-runs both md5s once per
    * dimension, so never use it on a real corpus. */
  private[graft] def hashEmbedPerDim(textCol: Column, dim: Int): Column = {
    val toks = tokens(textCol)
    array((0 until dim).map { d =>
      aggregate(toks, lit(0.0), (acc, t) =>
        acc + when(pmod(hash60(t), lit(dim.toLong)) === d,
          (pmod(hash60Seeded(t, 1), lit(2001L)) - 1000L).cast("double") / 1000.0)
          .otherwise(0.0))
    }: _*)
  }

  def tokenCount(c: Column): Column = size(tokens(c))

  /** Word n-gram shingles (space-joined), distinct. Guarded for short
    * docs (Spark's `sequence(1, n)` runs DESCENDING when n < 1). */
  def shingles(toks: Column, n: Int): Column = {
    val grams = transform(sequence(lit(1), size(toks) - (n - 1)),
      i => concat_ws(" ", slice(toks, i, lit(n))))
    array_distinct(when(size(toks) >= n, grams).otherwise(array()))
  }

  /** Hashed word n-gram shingles straight from per-token hashes:
    * `sh(i) = fold_{j<n} (acc * 65599 + th(i+j)) mod P`, `th` = 32-bit
    * [[hash60]] of each token, P = [[graft.operators.Dedup.MinhashPrime]],
    * final value reduced mod 2^32 (the minhash permutation domain).
    *
    * Why not hash shingle STRINGS: per-gram `concat_ws` + `slice`
    * allocates a string per shingle and md5-hashes ~n× the corpus
    * bytes. Here md5 runs once per TOKEN and the gram combine is n-1
    * `zip_with` passes over n shifted array slices — constant
    * allocations per document, not per gram. Overflow-safe in signed
    * 64-bit in both engines: acc < P < 2^33, acc*65599 < 2^50.
    * DuckDB mirror (n = 3):
    * `((((th[i]*65599 + th[i+1]) % P) * 65599 + th[i+2]) % P) % 4294967296`. */
  def hashedShingles(toks: Column, n: Int): Column =
    array_distinct(gramHashes(toks, n))

  /** Positional variant of [[hashedShingles]]: the same rolling-fold
    * gram hashes WITHOUT the distinct, in token order — element `i`
    * (0-based) is the hash of the n-gram starting at token `i`.
    * Substring-level dedup needs every OCCURRENCE (position), not the
    * set: the set answers "do these documents share content", the
    * positions answer "which spans of this document are duplicated". */
  def gramHashes(toks: Column, n: Int): Column = {
    val th = transform(toks, t => hash60(t) % 4294967296L)
    val m = greatest(size(th) - (n - 1), lit(0))
    val shifted = (0 until n).map(j => slice(th, lit(j + 1), m))
    val combined = shifted.reduce((acc, nxt) =>
      zip_with(acc, nxt, (a, b) => pmod(a * 65599L + b, lit(4294967311L))))
    transform(combined, h => h % 4294967296L)
  }

  /** Driver-side twin of one [[gramHashes]] element for a LITERAL
    * phrase: the 32-bit rolling gram hash the phrase's tokens produce
    * in-plan — `th = hash60(tok) mod 2^32`, then the
    * `(acc·65599 + th) mod 4294967311` left fold, reduced mod 2^32.
    * Fold structure mirrors [[gramHashes]] exactly (first element
    * enters un-modded; it is < 2^32 < P, so the chains agree), and
    * the arithmetic stays in positive signed-64 range. Lets a phrase
    * become a plan-time literal for map-side matching
    * ([[graft.operators.InvertedIndex.phraseSearch]]). */
  def phraseHash(phrase: Seq[String]): Long = {
    require(phrase.nonEmpty, "empty phrase")
    val th = phrase.map(t => graft.plans.Md5Hash60.hash(
      org.apache.spark.unsafe.types.UTF8String.fromString(t)) % 4294967296L)
    th.reduce((a, b) => Math.floorMod(a * 65599L + b, 4294967311L)) % 4294967296L
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
