package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

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
  /** `events.ts` normalization — the generated parquet has shipped two
    * physical types, and every downstream query expects TimestampType:
    *
    *  - TIMESTAMP(NANOS): Spark's vectorized reader rejects it;
    *    Sessions set `spark.sql.legacy.parquet.nanosAsLong=true` (see
    *    [[Sessions]]) so it arrives as long nanos and we floor-divide
    *    to microseconds — exactly DuckDB's truncation of ns→µs,
    *    keeping oracles aligned. Integer `div` (not `/`): ns epochs
    *    exceed double's 2^53 mantissa.
    *  - TIMESTAMP(MICROS, isAdjustedToUTC=false): Spark infers
    *    TIMESTAMP_NTZ, which `unix_micros` rejects (DATATYPE_MISMATCH).
    *    [[Sessions]] disables `inferTimestampNTZ` so the same file
    *    reads as TimestampType directly (the raw micros ARE the UTC
    *    instant, matching DuckDB's naive read); the cast case below
    *    covers sessions built without that config — under the UTC
    *    session timezone the NTZ→LTZ cast is micros-preserving. */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    val raw = table(spark, sfDir, "events")
    val out = raw.schema("ts").dataType match {
      case LongType => raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType => raw.withColumn("ts", col("ts").cast(TimestampType))
      case _        => raw
    }
    // Regenerated testdata has already shipped surprise ts shapes twice
    // (nanos-as-long, then NTZ micros). A third one must fail HERE with
    // the actual type, not 9 queries later as DATATYPE_MISMATCH.
    require(out.schema("ts").dataType == TimestampType,
      s"events.ts normalized to ${out.schema("ts").dataType}, expected TimestampType — " +
        "new parquet physical type? Add a case above (see round-7/8 history).")
    out
  }
  def documents(spark: SparkSession, sfDir: String): DataFrame  = table(spark, sfDir, "documents")
  def embeddings(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "embeddings")
}
