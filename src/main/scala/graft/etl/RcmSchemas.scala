package graft.etl

import org.apache.spark.sql.types._

/** Source-table schemas for the healthcare-RCM pipeline, declared from
  * the reference's DDLs (`/root/reference/SQL/hospital_dbs/hospital{1,2}_db/ddl.sql`)
  * and claims CSV header (`Data/claims/hospital1_claim_data.csv:1`). Fixed at the edges,
  * exactly like the reference (SURVEY.md §1 "schema system").
  *
  * Date columns the reference receives typed from MySQL are DateType
  * here; date columns it parses itself post-read (claims dates, via
  * `pd.to_datetime(errors='coerce')`, `python/transform.py:36-39`) are
  * StringType and parsed by [[RcmTransform]] with the same coercion.
  */
object RcmSchemas {

  val departments: StructType = StructType(Seq(
    StructField("DeptID", StringType),
    StructField("Name", StringType)))

  val encounters: StructType = StructType(Seq(
    StructField("EncounterID", StringType),
    StructField("PatientID", StringType),
    StructField("EncounterDate", DateType),
    StructField("EncounterType", StringType),
    StructField("ProviderID", StringType),
    StructField("DepartmentID", StringType),
    StructField("ProcedureCode", IntegerType),
    StructField("InsertedDate", DateType),
    StructField("ModifiedDate", DateType)))

  /** Hospital A shape (`hospital1_db/ddl.sql:29-41`). */
  val patientsA: StructType = StructType(Seq(
    StructField("PatientID", StringType),
    StructField("FirstName", StringType),
    StructField("LastName", StringType),
    StructField("MiddleName", StringType),
    StructField("SSN", StringType),
    StructField("PhoneNumber", StringType),
    StructField("Gender", StringType),
    StructField("DOB", DateType),
    StructField("Address", StringType),
    StructField("ModifiedDate", DateType)))

  /** Hospital B shape (`hospital2_db/ddl.sql:28-40`): divergent column
    * names + `Updated_Date` instead of `ModifiedDate` (never renamed —
    * the unioned table carries both, half-null; SURVEY.md §1 quirk). */
  val patientsB: StructType = StructType(Seq(
    StructField("ID", StringType),
    StructField("F_Name", StringType),
    StructField("L_Name", StringType),
    StructField("M_Name", StringType),
    StructField("SSN", StringType),
    StructField("PhoneNumber", StringType),
    StructField("Gender", StringType),
    StructField("DOB", DateType),
    StructField("Address", StringType),
    StructField("Updated_Date", DateType)))

  val providers: StructType = StructType(Seq(
    StructField("ProviderID", StringType),
    StructField("FirstName", StringType),
    StructField("LastName", StringType),
    StructField("Specialization", StringType),
    StructField("DeptID", StringType),
    StructField("NPI", LongType)))

  val transactions: StructType = StructType(Seq(
    StructField("TransactionID", StringType),
    StructField("EncounterID", StringType),
    StructField("PatientID", StringType),
    StructField("ProviderID", StringType),
    StructField("DeptID", StringType),
    StructField("VisitDate", DateType),
    StructField("ServiceDate", DateType),
    StructField("PaidDate", DateType),
    StructField("VisitType", StringType),
    StructField("Amount", DoubleType),
    StructField("AmountType", StringType),
    StructField("PaidAmount", DoubleType),
    StructField("ClaimID", StringType),
    StructField("PayorID", StringType),
    StructField("ProcedureCode", IntegerType),
    StructField("ICDCode", StringType),
    StructField("LineOfBusiness", StringType),
    StructField("MedicaidID", StringType),
    StructField("MedicareID", StringType),
    StructField("InsertDate", DateType),
    StructField("ModifiedDate", DateType)))

  /** Claims CSV — dates stay strings; parsed in [[RcmTransform]]. */
  val claims: StructType = StructType(Seq(
    StructField("ClaimID", StringType),
    StructField("TransactionID", StringType),
    StructField("PatientID", StringType),
    StructField("EncounterID", StringType),
    StructField("ProviderID", StringType),
    StructField("DeptID", StringType),
    StructField("ServiceDate", StringType),
    StructField("ClaimDate", StringType),
    StructField("PayorID", StringType),
    StructField("ClaimAmount", DoubleType),
    StructField("PaidAmount", DoubleType),
    StructField("ClaimStatus", StringType),
    StructField("PayorType", StringType),
    StructField("Deductible", DoubleType),
    StructField("Coinsurance", DoubleType),
    StructField("Copay", DoubleType),
    StructField("InsertDate", StringType),
    StructField("ModifiedDate", StringType)))
}
