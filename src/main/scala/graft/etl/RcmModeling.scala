package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Cleaning

/** Phase-4 star-schema assembly — re-expression of
  * `/root/reference/python/dimensional_modeling.py`.
  *
  * Faithful quirks (BASELINE.md data-quality rows — never "fixed"):
  *  - transactions' `ProviderID` (`PROV####`) never matches providers'
  *    (`H{1,2}-PROV####`) → `provider_sk` is 100% null in
  *    fact_transactions (`dimensional_modeling.py:61`);
  *  - dim_date holds only transaction/encounter dates, not claim dates
  *    (`dimensional_modeling.py:38`);
  *  - `dim_departments` is declared by the loader (`load.py:55-58`)
  *    but never built by the reference — we build it (SURVEY.md §2,
  *    table note) since a faithful warehouse needs it;
  *  - procedure descriptions are synthesized, the CPT lookup is unused
  *    (`dimensional_modeling.py:34`).
  *
  * Scale notes: all four fact-side dimension-key joins are broadcast
  * (dimension key maps are tiny relative to facts), so fact tables
  * never shuffle during key resolution; the only shuffles in this
  * phase are the `distinct()`s that build dim_procedures/dim_date,
  * which reduce map-side first (partial aggregation).
  */
object RcmModeling {

  final case class StarSchema(dimensions: Map[String, DataFrame], facts: Map[String, DataFrame])

  /** Validation counts (`dimensional_modeling.py:80-100`): the
    * referential-integrity orphan check (expected 36 on the reference
    * data, README.md:177) and the non-positive-amount business rule. */
  final case class Validation(orphanedPatients: Long, nonPositiveAmounts: Long)

  def createDimensions(tables: Map[String, DataFrame]): Map[String, DataFrame] = {
    val patients = tables("patients")
    val dimPatients = patients.select(
      col("patient_sk"), col("unified_patient_id"), col("FirstName"),
      col("LastName"), col("Gender"), col("age"), col("Address"),
      col("source_hospital"))

    val dimProviders = tables("providers")
      .join(broadcast(tables("departments")
        .select(col("DeptID"), col("Name"), col("source_hospital"))),
        Seq("DeptID", "source_hospital"), "left")
      .withColumnRenamed("Name", "DepartmentName")
      .select(col("provider_sk"), col("ProviderID"), col("FirstName"),
        col("LastName"), col("Specialization"), col("DepartmentName"),
        col("NPI"), col("source_hospital"))

    // dim_procedures: distinct codes; sk = rank of the sorted code (the
    // reference uses appearance order — an artifact of pandas state; we
    // pick the deterministic total order, SURVEY.md §7.3).
    val dimProcedures = tables("transactions")
      .select(col("ProcedureCode")).na.drop().distinct()
      .withColumn("procedure_sk",
        row_number().over(Window.orderBy(col("ProcedureCode"))).cast("long") - 1)
      .withColumn("ProcedureDescription",
        concat(lit("Desc for Code "), col("ProcedureCode").cast("string")))
      .select(col("ProcedureCode"), col("procedure_sk"), col("ProcedureDescription"))

    // dim_date: transaction ∪ encounter dates (NOT claim dates).
    val dimDate = tables("transactions").select(col("ServiceDate").as("full_date"))
      .unionByName(tables("encounters").select(col("EncounterDate").as("full_date")))
      .na.drop().distinct()
      .withColumn("date_sk", row_number().over(Window.orderBy(col("full_date"))).cast("long") - 1)
      .withColumn("year", year(col("full_date")))
      .withColumn("month", month(col("full_date")))
      .withColumn("quarter", quarter(col("full_date")))
      .withColumn("day_of_week", Cleaning.dayName(col("full_date")))

    val dimDepartments = tables("departments").select(
      col("department_sk"), col("DeptID"), col("Name"), col("source_hospital"))

    Map(
      "dim_patients" -> dimPatients,
      "dim_providers" -> dimProviders,
      "dim_procedures" -> dimProcedures,
      "dim_date" -> dimDate,
      "dim_departments" -> dimDepartments)
  }

  def createFacts(tables: Map[String, DataFrame], claims: DataFrame,
      dims: Map[String, DataFrame]): Map[String, DataFrame] = {

    // When dim_patients is SCD2-maintained, facts key against CURRENT
    // rows only (history versions are dimension-side).
    val dimPatients = dims("dim_patients")
    val patientsLookup = (if (dimPatients.columns.contains("is_current"))
        dimPatients.filter(col("is_current")) else dimPatients)
      .select(col("unified_patient_id"), col("patient_sk"))
    val providersLookup = dims("dim_providers").select(col("ProviderID"), col("source_hospital"), col("provider_sk"))
    val dateLookup = dims("dim_date").select(col("full_date"), col("date_sk"))
    val proceduresLookup = dims("dim_procedures").select(col("ProcedureCode"), col("procedure_sk"))

    // fact_transactions: re-derive the unified id then resolve all four
    // dimension keys by broadcast left joins (J3).
    val trans = tables("transactions")
      .withColumn("unified_patient_id",
        Cleaning.unifiedPatientId(col("source_hospital"), col("PatientID")))
    val mergedTrans = trans
      .join(broadcast(patientsLookup), Seq("unified_patient_id"), "left")
      .join(broadcast(providersLookup), Seq("ProviderID", "source_hospital"), "left")
      .join(broadcast(proceduresLookup), Seq("ProcedureCode"), "left")
      .join(broadcast(dateLookup), trans("ServiceDate") === dateLookup("full_date"), "left")
    val factTransactions = mergedTrans.select(
      col("TransactionID"), col("EncounterID"), col("patient_sk"),
      col("provider_sk"), col("procedure_sk"), col("date_sk"),
      col("Amount"), col("PaidAmount"))

    // fact_claims: inherit patient_sk through the transactions lookup
    // on (TransactionID, source_hospital) — TransactionID alone
    // collides across hospitals (J4).
    val transLookup = mergedTrans.select(col("TransactionID"), col("patient_sk"), col("source_hospital"))
    val mergedClaims = claims
      .join(transLookup, Seq("TransactionID", "source_hospital"), "left")
      .join(broadcast(dateLookup), claims("ServiceDate") === dateLookup("full_date"), "left")
    val factClaims = mergedClaims.select(
      col("ClaimID"), col("TransactionID"), col("patient_sk"), col("date_sk"),
      col("ClaimAmount"), col("PaidAmount"), col("ClaimStatus"), col("PayorType"),
      col("Deductible"), col("Coinsurance"), col("Copay"), col("days_to_payment"))

    Map("fact_transactions" -> factTransactions, "fact_claims" -> factClaims)
  }

  def validate(star: StarSchema): Validation = {
    val factTrans = star.facts("fact_transactions")
    val validKeys = star.dimensions("dim_patients").select(col("patient_sk")).distinct()
    val orphans = factTrans.join(validKeys, Seq("patient_sk"), "left_anti").count()
    val nonPositive = factTrans.filter(col("Amount") <= 0).count()
    Validation(orphans, nonPositive)
  }

  def run(tables: Map[String, DataFrame], claims: DataFrame): StarSchema = {
    val dims = createDimensions(tables)
    StarSchema(dims, createFacts(tables, claims, dims))
  }
}
