package graft

import java.nio.file.{Files, Paths, StandardCopyOption}
import java.time.LocalDate

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.etl.RcmPipeline

/** Pipeline-level SCD2 across two runs with real source mutations:
  * copy the reference CSVs to a temp dir, change some patient
  * addresses, and verify the second pipeline run versions exactly
  * those patients. */
class RcmIncrementalSpec extends AnyFunSuite {
  lazy val spark = Sessions.local(8)

  /** Copy the reference data layout, then rewrite hospital1 patients:
    * patients whose id ends in '7' get a new Address. */
  private def mutatedDataDir(): (String, Int) = {
    val root = Files.createTempDirectory("rcm_mut").toString
    for (h <- Seq("hospital1_db", "hospital2_db")) {
      val dst = Paths.get(s"$root/SQL/hospital_dbs/$h")
      Files.createDirectories(dst)
      Files.list(Paths.get(s"/root/reference/SQL/hospital_dbs/$h")).iterator().asScala
        .filter(_.toString.endsWith(".csv"))
        .foreach(f => Files.copy(f, dst.resolve(f.getFileName.toString),
          StandardCopyOption.REPLACE_EXISTING))
    }
    Files.createDirectories(Paths.get(s"$root/Data/claims"))
    for (f <- Seq("hospital1_claim_data.csv", "hospital2_claim_data.csv"))
      Files.copy(Paths.get(s"/root/reference/Data/claims/$f"),
        Paths.get(s"$root/Data/claims/$f"), StandardCopyOption.REPLACE_EXISTING)

    // mutate: quoted-CSV-safe rewrite of the Address field via Spark
    val pPath = s"$root/SQL/hospital_dbs/hospital1_db/patients.csv"
    val p = spark.read.option("header", "true").schema(graft.etl.RcmSchemas.patientsA)
      .csv(pPath)
    val mutated = p.withColumn("Address",
      when(col("PatientID").endsWith("7"), lit("999 Changed Street")).otherwise(col("Address")))
    val nChanged = mutated.filter(col("Address") === "999 Changed Street").count().toInt
    val tmpOut = s"$root/patients_rewrite"
    mutated.coalesce(1).write.option("header", "true").mode("overwrite").csv(tmpOut)
    val part = Files.list(Paths.get(tmpOut)).iterator().asScala
      .find(_.toString.endsWith(".csv")).get
    Files.copy(part, Paths.get(pPath), StandardCopyOption.REPLACE_EXISTING)
    (root, nChanged)
  }

  test("second pipeline run versions exactly the address-changed patients") {
    val run1 = RcmPipeline.run(spark, "/root/reference", LocalDate.parse("2024-12-01"))
    val existing = run1.star.dimensions("dim_patients").localCheckpoint()

    val (mutDir, nChanged) = mutatedDataDir()
    assert(nChanged > 0)
    val run2 = RcmPipeline.run(spark, mutDir, LocalDate.parse("2025-01-15"), Some(existing))
    val dim = run2.star.dimensions("dim_patients").localCheckpoint()

    assert(dim.count() == 10000L + nChanged) // one expired row per change
    val v2 = dim.filter(col("version") === 2)
    assert(v2.count() == nChanged.toLong)
    assert(v2.filter(col("Address") =!= "999 Changed Street").count() == 0)
    assert(v2.filter(!col("is_current")).count() == 0)
    // expired partners: v1, not current, expiry = 2025-01-14
    val expired = dim.filter(!col("is_current"))
    assert(expired.count() == nChanged.toLong)
    assert(expired.filter(col("expiry_date") =!= lit("2025-01-14").cast("date")).count() == 0)
    // exactly one current row per id, and facts only reference current sks
    val dupCurrent = dim.filter(col("is_current"))
      .groupBy("unified_patient_id").count().filter(col("count") > 1).count()
    assert(dupCurrent == 0L)
    val factSks = run2.star.facts("fact_transactions")
      .select(col("patient_sk")).na.drop().distinct()
    val currentSks = dim.filter(col("is_current")).select("patient_sk").distinct()
    assert(factSks.join(currentSks, Seq("patient_sk"), "left_anti").count() == 0L)
  }
}
