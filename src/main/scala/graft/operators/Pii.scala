package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PII scrubbing for a training corpus: detect and redact emails,
  * IPv4 addresses, US SSNs and phone numbers before export — the
  * standard pre-training privacy pass (the reference pipeline carries
  * patient PHI through `python/transform.py`; a corpus engine must be
  * able to strip it, not just normalize it).
  *
  * Scale design (100 TB): pure map-side `regexp_replace` /
  * `regexp_count` compositions — whole-stage codegen, zero shuffle,
  * one pass over the corpus regardless of how many patterns run. The
  * pattern list is ordered and each rule rewrites the previous rule's
  * output, so overlapping matches resolve deterministically (emails
  * before IPs: `a@10.0.0.1` redacts as one email, not email+IP).
  *
  * Cross-engine determinism: the patterns use only regex constructs
  * with identical semantics in Java's engine and DuckDB's RE2 —
  * character classes, bounded repetition, alternation-free bodies,
  * `\b` word boundaries; no lookaround, no backreferences. Both
  * engines scan leftmost-first with greedy quantifiers, so match
  * spans — and therefore redacted output — are byte-identical.
  */
object Pii {

  /** (name, pattern, replacement) — applied IN ORDER. */
  val rules: Seq[(String, String, String)] = Seq(
    ("email", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b", "<IP>"),
    ("ssn", "\\b\\d{3}-\\d{2}-\\d{4}\\b", "<SSN>"),
    ("phone", "\\b\\d{3}[-. ]\\d{3}[-. ]\\d{4}\\b", "<PHONE>"))

  /** `textCol` with every rule's matches replaced by its tag. */
  def redact(textCol: Column): Column =
    rules.foldLeft(textCol) { case (c, (_, pat, tag)) =>
      regexp_replace(c, pat, tag)
    }

  /** Per-rule match counts over the SAME ordered rewrite the redaction
    * applies (an email's digits never double-count as a phone). */
  def counts(textCol: Column): Seq[(String, Column)] = {
    val staged = rules.scanLeft(textCol) { case (c, (_, pat, tag)) =>
      regexp_replace(c, pat, tag)
    }
    rules.zip(staged).map { case ((name, pat, _), prev) =>
      name -> regexp_count(prev, lit(pat))
    }
  }

  /** `df` plus `<outCol>` (redacted text) and one `n_<rule>` count per
    * rule. Fails fast on output-name collisions. */
  def scrub(df: DataFrame, textCol: String, outCol: String = "redacted"): DataFrame = {
    val outNames = outCol +: rules.map { case (n, _, _) => s"n_$n" }
    outNames.foreach(n => require(!df.columns.contains(n),
      s"input already has a '$n' column — rename it or pick another outCol"))
    val t = col(textCol)
    val withCounts = counts(t).foldLeft(df) { case (d, (name, c)) =>
      d.withColumn(s"n_$name", c.cast("long"))
    }
    withCounts.withColumn(outCol, redact(t))
  }
}
