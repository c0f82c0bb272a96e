package graft

import java.time.LocalDate

import org.scalatest.funsuite.AnyFunSuite

import graft.analytics.RcmAnalytics
import graft.etl.RcmPipeline

/** End-to-end pipeline parity against the reference's committed data
  * (`/root/reference`, read-only). Golden values computed independently
  * with DuckDB over the same CSVs; quirks per BASELINE.md. Note the
  * committed CSVs are a NEWER snapshot than the staging parquet
  * (10,000 unique patients vs 9,985; 0 orphans vs 36) — the financial
  * sums match the staging recompute exactly, so the claim-side data is
  * identical.
  */
class RcmPipelineSpec extends AnyFunSuite {
  lazy val spark = Sessions.local(8)

  private lazy val result =
    RcmPipeline.run(spark, "/root/reference", LocalDate.parse("2024-12-01"))
  private lazy val star = result.star

  test("dimension cardinalities match the committed source data") {
    assert(star.dimensions("dim_patients").count() == 10000L)
    assert(star.dimensions("dim_providers").count() == 55L)
    assert(star.dimensions("dim_procedures").count() == 996L)
    assert(star.dimensions("dim_date").count() == 1772L)
    assert(star.dimensions("dim_departments").count() == 40L) // 20 per hospital in the committed CSVs
  }

  test("fact cardinalities") {
    assert(star.facts("fact_transactions").count() == 20000L)
    assert(star.facts("fact_claims").count() == 20000L)
  }

  test("gender map quirk: every patient is Unknown (X2)") {
    val genders = star.dimensions("dim_patients")
      .select("Gender").distinct().collect().map(_.getString(0))
    assert(genders.toSeq == Seq("Unknown"))
  }

  test("provider_sk is 100% null in fact_transactions (J3 quirk)") {
    val f = star.facts("fact_transactions")
    assert(f.filter(f("provider_sk").isNotNull).count() == 0L)
  }

  test("referential integrity: 0 orphans on this snapshot; no bad amounts") {
    assert(result.validation.orphanedPatients == 0L)
    assert(result.validation.nonPositiveAmounts == 0L)
    // claims all resolve a date_sk (claim dates ⊂ txn/encounter dates)
    val fc = star.facts("fact_claims")
    assert(fc.filter(fc("date_sk").isNull).count() == 0L)
    assert(fc.filter(fc("patient_sk").isNull).count() == 0L)
  }

  test("dim_date spans 2020-01-01 .. 2024-11-06") {
    val row = star.dimensions("dim_date")
      .agg(org.apache.spark.sql.functions.min("full_date"),
        org.apache.spark.sql.functions.max("full_date")).collect().head
    assert(row.get(0).toString == "2020-01-01")
    assert(row.get(1).toString == "2024-11-06")
  }

  test("unified_patient_id format (X9)") {
    val ids = star.dimensions("dim_patients").select("unified_patient_id")
      .limit(100).collect().map(_.getString(0))
    assert(ids.forall(id => id.startsWith("A-HOSP") || id.startsWith("B-HOSP")))
  }

  test("write reconciles written-vs-reloaded counts per table (load.py:115-119)") {
    val dir = java.nio.file.Files.createTempDirectory("rcm_write_verify").toString
    val loads = RcmPipeline.write(star, dir)
    assert(loads.size == star.dimensions.size + star.facts.size)
    assert(loads.forall(_.reconciled), s"unreconciled: ${loads.filterNot(_.reconciled)}")
    val byName = loads.map(l => l.name -> l.reloaded).toMap
    assert(byName("fact_claims") == 20000L)
    assert(byName("dim_patients") == 10000L)
  }

  test("Q1 KPIs match the reference recompute (BASELINE.md)") {
    val r = RcmAnalytics.q1TotalRevenue(star).collect().head
    assert(math.abs(r.getAs[Double]("TotalBilledAmount") - 5.065520146e7) < 1.0)
    assert(math.abs(r.getAs[Double]("TotalCollectedAmount") - 4.552156564e7) < 1.0)
    val rate = r.getAs[Double]("OverallCollectionRatePercent")
    assert(math.abs(rate - 89.86) < 0.01)
  }

  test("Q4 payor mix matches the DuckDB recompute over the same CSVs") {
    val rows = RcmAnalytics.q4PayorPerformance(star).collect()
      .map(r => r.getAs[String]("PayorType") ->
        (r.getAs[Long]("TotalClaims"), r.getAs[Long]("ApprovedClaims"))).toMap
    assert(rows("Private") == (6784L, 1374L))
    assert(rows("Self-pay") == (6645L, 1309L))
    assert(rows("Government") == (6571L, 1314L))
  }

  test("Q7 avg days in A/R and Q8 write-offs match the recompute") {
    val ar = RcmAnalytics.q7AvgDaysInAR(star).collect().head.getAs[Double]("AverageDaysInAR")
    assert(math.abs(ar - -729.630472854641) < 1e-6)
    // this snapshot has NO denied claims with PaidAmount exactly 0 —
    // the write-off sum is null over an empty filter (pinned quirk)
    val wo = RcmAnalytics.q8TotalWriteOffs(star).collect().head
    assert(wo.isNullAt(wo.fieldIndex("TotalWriteOffAmount")))
  }

  test("all 11 analysis queries run and return rows") {
    RcmAnalytics.all.foreach { case (name, fn) =>
      assert(fn(star).count() > 0, s"$name returned no rows")
    }
  }

  test("SCD2 first run: all version 1, current, sk dense 0..N-1") {
    val dim = star.dimensions("dim_patients")
    import org.apache.spark.sql.functions._
    val agg = dim.agg(
      min("patient_sk"), max("patient_sk"),
      countDistinct("patient_sk"), sum(when(col("is_current"), 0).otherwise(1))).collect().head
    assert(agg.getLong(0) == 0L)
    assert(agg.getLong(1) == 9999L)
    assert(agg.getLong(2) == 10000L)
    assert(agg.getLong(3) == 0L)
  }
}
