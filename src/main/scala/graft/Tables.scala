package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{expr, timestamp_micros}
import org.apache.spark.sql.types.LongType

/** Loaders for the driver-generated TPC-H-ish testdata
  * (`/root/testdata/sf*`; see TESTDATA.md). One parquet file per table.
  *
  * All reads go through `spark.read.parquet` so Catalyst gets a
  * relation it can push filters/projections into (verified via
  * `.explain("formatted")`: `PushedFilters` / pruned `ReadSchema`).
  * At cluster scale the same call reads a partitioned directory; no
  * code change needed — paths are the only local-mode artifact.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def table(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    require(names.contains(name), s"unknown table: $name")
    spark.read.parquet(s"$sfDir/$name.parquet")
  }

  def region(spark: SparkSession, sfDir: String): DataFrame     = table(spark, sfDir, "region")
  def nation(spark: SparkSession, sfDir: String): DataFrame     = table(spark, sfDir, "nation")
  def customer(spark: SparkSession, sfDir: String): DataFrame   = table(spark, sfDir, "customer")
  def supplier(spark: SparkSession, sfDir: String): DataFrame   = table(spark, sfDir, "supplier")
  def part(spark: SparkSession, sfDir: String): DataFrame       = table(spark, sfDir, "part")
  def orders(spark: SparkSession, sfDir: String): DataFrame     = table(spark, sfDir, "orders")
  def lineitem(spark: SparkSession, sfDir: String): DataFrame   = table(spark, sfDir, "lineitem")
  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark's vectorized
    * reader rejects. Sessions set
    * `spark.sql.legacy.parquet.nanosAsLong=true` (see [[Sessions]]) so
    * it arrives as long nanos; we floor-divide to microseconds —
    * exactly DuckDB's truncation of ns→µs, keeping oracles aligned.
    * Integer `div` (not `/`): ns epochs exceed double's 2^53 mantissa. */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    val raw = table(spark, sfDir, "events")
    raw.schema("ts").dataType match {
      case LongType => raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case _        => raw
    }
  }
  def documents(spark: SparkSession, sfDir: String): DataFrame  = table(spark, sfDir, "documents")
  def embeddings(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "embeddings")
}
