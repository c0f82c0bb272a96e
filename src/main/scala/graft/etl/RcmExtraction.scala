package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.Cleaning

/** Phase-2 extraction + integration — re-expression of
  * `/root/reference/python/extraction.py:53-111`.
  *
  * The reference pulls five tables per hospital over MySQL
  * (`SELECT * FROM t`) plus a folder of claims CSVs. This offline
  * harness reads the same data from the committed CSVs with
  * DDL-declared schemas; a JDBC deployment swaps [[CsvSource]] for
  * [[JdbcSource]] — the integration logic is source-agnostic.
  *
  * Scale notes: each per-hospital read is an independent scan that
  * parallelizes by file split; union is a zero-shuffle operator in
  * Spark (partitions concatenate). `unified_patient_id` derivation is
  * a map-side expression. Nothing here shuffles.
  */
object RcmExtraction {

  val tablesToExtract: Seq[String] =
    Seq("departments", "encounters", "patients", "providers", "transactions")

  /** A hospital source system: how to read one named table. */
  trait Source {
    def read(spark: SparkSession, table: String): DataFrame
  }

  /** Offline stand-in for the MySQL scan (S1): CSV with the
    * DDL-derived schema. `hospital` picks the patients shape. */
  final case class CsvSource(dir: String, hospital: String) extends Source {
    def read(spark: SparkSession, table: String): DataFrame = {
      val schema = table match {
        case "departments"  => RcmSchemas.departments
        case "encounters"   => RcmSchemas.encounters
        case "providers"    => RcmSchemas.providers
        case "transactions" => RcmSchemas.transactions
        case "patients" =>
          if (hospital == "hospital_a") RcmSchemas.patientsA else RcmSchemas.patientsB
      }
      spark.read.option("header", "true").schema(schema).csv(s"$dir/$table.csv")
    }
  }

  /** Range partitioning for a parallel JDBC scan: Spark issues
    * `numPartitions` concurrent queries, each bounded by
    * `WHERE column >= lo AND column < hi` over equal-width strides of
    * `[lowerBound, upperBound)` — the first thing a real fact-table
    * scan needs (a single-stream read caps at one connection's
    * throughput regardless of cluster size). The column should be
    * indexed and roughly uniform; rows OUTSIDE the bounds still land
    * in the first/last stride (Spark's semantics — bounds shape the
    * strides, they do not filter). */
  final case class JdbcPartitioning(
      column: String, lowerBound: Long, upperBound: Long, numPartitions: Int) {
    require(numPartitions >= 1, s"numPartitions must be >= 1, got $numPartitions")
    require(lowerBound < upperBound,
      s"lowerBound $lowerBound must be < upperBound $upperBound")
  }

  object JdbcPartitioning {
    /** Discover bounds server-side (`SELECT MIN/MAX`) — one cheap
      * pushed-down aggregate, the usual prelude when bounds aren't
      * known a priori. Returns None for an empty or all-null column
      * (fall back to a single-stream read). The column is quoted
      * ANSI-style (`"c"`) in the probe SQL — case-preserving on
      * Derby/Postgres; MySQL needs `ANSI_QUOTES` or a lowercase
      * column. */
    def probe(spark: SparkSession, url: String, props: Map[String, String],
        qualifiedTable: String, column: String,
        numPartitions: Int): Option[JdbcPartitioning] = {
      val q = "\"" + column + "\""
      val r = spark.read.format("jdbc").option("url", url)
        .option("dbtable",
          s"(SELECT MIN($q) AS lo, MAX($q) AS hi FROM $qualifiedTable) b")
      val row = props.foldLeft(r) { case (acc, (k, v)) => acc.option(k, v) }
        .load().collect().head
      if (row.isNullAt(0) || row.isNullAt(1)) None
      else {
        val (lo, hi) = (row.getAs[Number](0).longValue, row.getAs[Number](1).longValue)
        // upperBound is exclusive in Spark's stride math; +1 keeps the
        // max row out of a degenerate final stride
        Some(JdbcPartitioning(column, lo, math.max(hi + 1, lo + 1), numPartitions))
      }
    }
  }

  /** Production path (S1 proper): `spark.read.format("jdbc")`, kept
    * behind the same interface. `partitioning` opts tables into the
    * parallel range scan ([[JdbcPartitioning]]) per table name; tables
    * without an entry read single-stream (dimension-sized tables don't
    * need N connections). */
  final case class JdbcSource(url: String, dbName: String,
      props: Map[String, String],
      partitioning: Map[String, JdbcPartitioning] = Map.empty)
      extends Source {
    def read(spark: SparkSession, table: String): DataFrame = {
      val base = spark.read.format("jdbc")
        .option("url", url).option("dbtable", s"$dbName.$table")
      val r = partitioning.get(table).fold(base) { p =>
        base.option("partitionColumn", p.column)
          .option("lowerBound", p.lowerBound)
          .option("upperBound", p.upperBound)
          .option("numPartitions", p.numPartitions)
      }
      props.foldLeft(r) { case (acc, (k, v)) => acc.option(k, v) }.load()
    }
  }

  /** Integrated output: the five unioned DB tables + unioned claims. */
  final case class RawData(tables: Map[String, DataFrame], claims: DataFrame)

  /** Standardize hospital B's patients to A's column names
    * (`extraction.py:80-82`). `Updated_Date` is deliberately NOT
    * renamed — the reference doesn't either. */
  def standardizePatients(df: DataFrame): DataFrame =
    df.withColumnsRenamed(Map(
      "ID" -> "PatientID", "F_Name" -> "FirstName",
      "L_Name" -> "LastName", "M_Name" -> "MiddleName"))

  def run(spark: SparkSession, hospitalA: Source, hospitalB: Source,
      claimsFiles: Seq[(String, String)]): RawData = {

    val integrated = tablesToExtract.map { t =>
      val a = hospitalA.read(spark, t)
      val rawB = hospitalB.read(spark, t)
      val b = if (t == "patients") standardizePatients(rawB) else rawB
      // Union by name with null-fill: the patients halves differ in
      // ModifiedDate vs Updated_Date (U1, SURVEY.md §2.8).
      val unioned = a.withColumn("source_hospital", lit("hospital_a"))
        .unionByName(b.withColumn("source_hospital", lit("hospital_b")),
          allowMissingColumns = true)
      t -> unioned
    }.toMap

    val patients = integrated("patients").withColumn("unified_patient_id",
      Cleaning.unifiedPatientId(col("source_hospital"), col("PatientID")))

    // Claims: source tagged from the filename (`extraction.py:99-106`).
    val claims = claimsFiles.map { case (path, source) =>
      spark.read.option("header", "true").schema(RcmSchemas.claims).csv(path)
        .withColumn("source_hospital", lit(source))
    }.reduce(_.unionByName(_))

    RawData(integrated + ("patients" -> patients), claims)
  }

  /** Convenience for the reference's committed data layout. */
  def runOnReferenceData(spark: SparkSession, refDir: String): RawData = run(
    spark,
    CsvSource(s"$refDir/SQL/hospital_dbs/hospital1_db", "hospital_a"),
    CsvSource(s"$refDir/SQL/hospital_dbs/hospital2_db", "hospital_b"),
    Seq(
      (s"$refDir/Data/claims/hospital1_claim_data.csv", "hospital_a"),
      (s"$refDir/Data/claims/hospital2_claim_data.csv", "hospital_b")))
}
