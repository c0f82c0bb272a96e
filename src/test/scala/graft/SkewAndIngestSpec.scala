package graft

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Skew
import graft.streaming.ClaimsIngest

class SkewAndIngestSpec extends AnyFunSuite {
  lazy val spark = Sessions.local(4)

  test("saltedSum equals the direct aggregation (decimal-exact)") {
    val e = Tables.events(spark, "/root/testdata/sf0.001")
    val direct = e.groupBy(col("event_type"))
      .agg(sum(col("value").cast("decimal(28,9)")).cast("double").as("total"),
        count(lit(1)).as("n_rows"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getLong(2))).toMap
    val salted = Skew.saltedSum(e, Seq("event_type"), col("value"), buckets = 7)
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getLong(2))).toMap
    assert(salted == direct)
  }

  test("saltedCountDistinct equals countDistinct even with one hot key") {
    val base = Tables.events(spark, "/root/testdata/sf0.001")
    val clicks = base.filter(col("event_type") === "click")
    // make 'click' a heavy hitter: 5x its original row count
    val e = base.union(clicks).union(clicks).union(clicks).union(clicks)
    val direct = e.groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val salted = Skew.saltedCountDistinct(e, Seq("event_type"), col("user_id"), 7)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(salted == direct)
  }

  test("streaming claims ingestion: incremental file drops, exactly-once totals") {
    val watch = Files.createTempDirectory("claims_in").toString
    val out = Files.createTempDirectory("claims_out").toString
    val cp = Files.createTempDirectory("claims_cp").toString

    Files.copy(Paths.get("/root/reference/Data/claims/hospital1_claim_data.csv"),
      Paths.get(s"$watch/hospital1_claim_data.csv"), StandardCopyOption.REPLACE_EXISTING)
    val q = ClaimsIngest.start(spark, watch, out, cp)
    try {
      q.processAllAvailable()
      assert(spark.read.parquet(out).count() == 10000L)

      // second drop is picked up incrementally, first file not re-read
      Files.copy(Paths.get("/root/reference/Data/claims/hospital2_claim_data.csv"),
        Paths.get(s"$watch/hospital2_claim_data.csv"), StandardCopyOption.REPLACE_EXISTING)
      q.processAllAvailable()
      val result = spark.read.parquet(out)
      assert(result.count() == 20000L)
      val bySource = result.groupBy("source_hospital").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(bySource == Map("hospital_a" -> 10000L, "hospital_b" -> 10000L))
      // cleaning ran in-stream: enrichment columns are present
      assert(result.columns.contains("days_to_payment"))
      assert(result.columns.contains("coverage_percentage"))
    } finally q.stop()
  }
}
