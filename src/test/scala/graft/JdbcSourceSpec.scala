package graft

import java.nio.file.Files
import java.sql.DriverManager
import java.time.LocalDate

import org.scalatest.funsuite.AnyFunSuite

import graft.etl.{RcmExtraction, RcmPipeline}
import graft.etl.RcmExtraction.{CsvSource, JdbcPartitioning, JdbcSource}

/** Exercises the production JDBC extraction path (S1 proper,
  * `extraction.py:20-41`) end-to-end against an embedded Apache Derby
  * database — no external server, same `spark.read.format("jdbc")`
  * machinery a MySQL deployment uses. The hospital CSVs are loaded
  * INTO Derby through Spark's JDBC writer, then extracted back through
  * [[graft.etl.RcmExtraction.JdbcSource]] and run through the full
  * pipeline; results must match the CSV path exactly.
  */
class JdbcSourceSpec extends AnyFunSuite {
  lazy val spark = Sessions.local(4)

  private val refDir = "/root/reference"
  private val driver = "org.apache.derby.jdbc.EmbeddedDriver"

  /** One embedded DB with a schema per hospital, populated from the
    * committed CSVs via Spark's JDBC writer. */
  private lazy val url: String = {
    val dbDir = Files.createTempDirectory("derby_rcm").toString
    val u = s"jdbc:derby:$dbDir/rcm;create=true"
    val conn = DriverManager.getConnection(u)
    try Seq("hospital_a", "hospital_b").foreach { s =>
      conn.createStatement().execute(s"CREATE SCHEMA $s")
    } finally conn.close()
    Seq(("hospital_a", "hospital1_db"), ("hospital_b", "hospital2_db"))
      .foreach { case (hosp, dbDirName) =>
        val csv = CsvSource(s"$refDir/SQL/hospital_dbs/$dbDirName", hosp)
        RcmExtraction.tablesToExtract.foreach { t =>
          csv.read(spark, t).write.format("jdbc")
            .option("url", u).option("dbtable", s"$hosp.$t")
            .option("driver", driver).save()
        }
      }
    u
  }

  private def jdbcRaw: RcmExtraction.RawData = RcmExtraction.run(
    spark,
    JdbcSource(url, "hospital_a", Map("driver" -> driver)),
    JdbcSource(url, "hospital_b", Map("driver" -> driver)),
    Seq(
      (s"$refDir/Data/claims/hospital1_claim_data.csv", "hospital_a"),
      (s"$refDir/Data/claims/hospital2_claim_data.csv", "hospital_b")))

  test("JDBC extraction matches CSV extraction table-for-table") {
    val viaJdbc = jdbcRaw
    val viaCsv = RcmExtraction.runOnReferenceData(spark, refDir)
    RcmExtraction.tablesToExtract.foreach { t =>
      val j = viaJdbc.tables(t)
      val c = viaCsv.tables(t)
      assert(j.columns.sorted.toSeq == c.columns.sorted.toSeq, s"$t columns")
      assert(j.count() == c.count(), s"$t count")
    }
    // small tables: full row multisets must agree, not just counts
    Seq("departments", "providers").foreach { t =>
      val j = jdbcRaw.tables(t).collect().map(_.toString).sorted.toSeq
      val c = viaCsv.tables(t).collect().map(_.toString).sorted.toSeq
      assert(j == c, s"$t rows differ between JDBC and CSV extraction")
    }
  }

  test("partitioned JDBC scan: N input tasks, exact row parity with single-stream") {
    val single = JdbcSource(url, "hospital_a", Map("driver" -> driver))
      .read(spark, "transactions")
    val part = JdbcSource(url, "hospital_a", Map("driver" -> driver),
        partitioning = Map("transactions" ->
          JdbcPartitioning("ProcedureCode", 99200, 99600, 4)))
      .read(spark, "transactions")

    assert(single.rdd.getNumPartitions == 1)
    assert(part.rdd.getNumPartitions == 4, "range scan must issue 4 partitions")
    // parity must be exact multiset equality, not just a count: stride
    // boundary bugs drop or duplicate boundary rows while preserving
    // plausible-looking totals
    val s = single.collect().map(_.toString).sorted.toSeq
    val p = part.collect().map(_.toString).sorted.toSeq
    assert(p == s, "partitioned read must return exactly the single-stream rows")
  }

  test("JdbcPartitioning.probe discovers MIN/MAX bounds server-side") {
    val probed = JdbcPartitioning.probe(spark, url, Map("driver" -> driver),
      "hospital_a.transactions", "ProcedureCode", numPartitions = 8)
    assert(probed.isDefined)
    val p = probed.get
    assert(p.numPartitions == 8)
    // bounds must bracket the actual domain (strides cover every row)
    val mm = JdbcSource(url, "hospital_a", Map("driver" -> driver))
      .read(spark, "transactions")
      .agg(org.apache.spark.sql.functions.min("ProcedureCode"),
        org.apache.spark.sql.functions.max("ProcedureCode")).collect().head
    assert(p.lowerBound == mm.getInt(0).toLong)
    assert(p.upperBound == mm.getInt(1).toLong + 1)

    val df = JdbcSource(url, "hospital_a", Map("driver" -> driver),
        partitioning = Map("transactions" -> p)).read(spark, "transactions")
    assert(df.rdd.getNumPartitions == 8)
    assert(df.count() == 10000L)
  }

  test("filters push down to the JDBC source (server-side WHERE, not a full scan)") {
    val src = JdbcSource(url, "hospital_a", Map("driver" -> driver))
    val code = src.read(spark, "transactions")
      .select(org.apache.spark.sql.functions.min("ProcedureCode"))
      .collect().head.getInt(0)
    val df = src.read(spark, "transactions")
      .filter(org.apache.spark.sql.functions.col("ProcedureCode") === code)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters:") &&
      plan.contains(s"EqualTo(ProcedureCode,$code)"),
      s"ProcedureCode filter must reach the JDBC scan, got:\n$plan")
    assert(df.count() > 0)
  }

  test("full pipeline over JDBC extraction reproduces RcmPipelineSpec counts") {
    val result = RcmPipeline.runRaw(jdbcRaw, LocalDate.parse("2024-12-01"))
    assert(result.star.dimensions("dim_patients").count() == 10000L)
    assert(result.star.dimensions("dim_providers").count() == 55L)
    assert(result.star.dimensions("dim_procedures").count() == 996L)
    assert(result.star.facts("fact_transactions").count() == 20000L)
    assert(result.star.facts("fact_claims").count() == 20000L)
    assert(result.validation.orphanedPatients == 0L)
  }
}
