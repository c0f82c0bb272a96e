package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType}

/** Scalar cleaning/enrichment functions — SURVEY.md §2.9 (X1–X11).
  *
  * All are compositions of built-in `org.apache.spark.sql.functions`
  * so they stay inside whole-stage codegen (no UDFs in the hot path).
  * Reference semantics cited per function
  * (`/root/reference/python/transform.py`, `extraction.py`).
  */
object Cleaning {

  /** X1 — title-case a name and fill nulls with "Unknown".
    * Reference: `python/transform.py:21-22` (`str.title().fillna('Unknown')`).
    * `initcap` matches pandas `str.title` on space-separated words;
    * both differ only after digits/apostrophes (documented risk,
    * SURVEY.md §7.3 — pinned by golden tests, not observed in data).
    */
  def cleanName(c: Column): Column = coalesce(initcap(c), lit("Unknown"))

  /** X2 — gender normalization through an M/F/O map, else "Unknown".
    * Reference: `python/transform.py:23-24`. The reference's data holds
    * full words (`Male`/`Female`) so every row maps to "Unknown" —
    * faithful rebuilds preserve that (BASELINE.md data-quality rows).
    */
  def normalizeGender(c: Column): Column =
    when(upper(c) === "M", "Male")
      .when(upper(c) === "F", "Female")
      .when(upper(c) === "O", "Other")
      .otherwise("Unknown")

  /** X3 — strip every non-digit from a phone number.
    * Reference: `python/transform.py:25` (`str.replace(r'\D','')`). */
  def phoneDigits(c: Column): Column =
    regexp_replace(c.cast(StringType), "\\D", "")

  /** X4 — date parse with coercion to null on failure.
    * Reference: `python/transform.py:26,36-39`
    * (`pd.to_datetime(errors='coerce')`). `try_to_date` is the ANSI-mode
    * equivalent (plain `to_date` throws under ANSI). */
  def parseDate(c: Column): Column = try_to_date(c)

  /** X5 — exact calendar age as of a given date.
    * Reference: `python/transform.py:27-30`: year difference minus one
    * when the (month, day) anniversary has not yet occurred. The
    * reference uses wall-clock `datetime.now()`; we parameterize `asOf`
    * for determinism (SURVEY.md §7.3 "wall-clock dependence"). */
  def age(dob: Column, asOf: Column): Column =
    (year(asOf) - year(dob) -
      when(month(asOf) < month(dob) ||
        (month(asOf) === month(dob) && dayofmonth(asOf) < dayofmonth(dob)), 1)
        .otherwise(0)).cast(LongType)

  /** X6 — coverage percentage: paid / nullif(claim, 0) * 100, null→0,
    * rounded to 2. Reference: `python/transform.py:40`. */
  def coveragePercentage(paid: Column, claim: Column): Column =
    round(coalesce(paid / nullif(claim, lit(0)) * 100, lit(0.0)), 2)

  /** X7 — integer day difference (negative allowed).
    * Reference: `python/transform.py:41` (`(modified - service).dt.days`). */
  def daysToPayment(modified: Column, service: Column): Column =
    datediff(modified, service).cast(LongType)

  /** X8 — English weekday name. Reference: `dt.day_name()`
    * (`python/dimensional_modeling.py:44`). `date_format(_, "EEEE")`
    * is locale-dependent; tests pin the JVM default to English. */
  def dayName(c: Column): Column = date_format(c, "EEEE")

  /** X9 — unified patient id:
    * `upper(replace(source_hospital, 'hospital_', '')) + '-' + id`.
    * Reference: `python/extraction.py:96`, re-derived at
    * `python/dimensional_modeling.py:59`. */
  def unifiedPatientId(sourceHospital: Column, patientId: Column): Column =
    concat(upper(regexp_replace(sourceHospital, "hospital_", "")),
      lit("-"), patientId.cast(StringType))
}
