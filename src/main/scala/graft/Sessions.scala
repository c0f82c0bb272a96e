package graft

import org.apache.spark.sql.SparkSession

/** Shared SparkSession construction so Verify, Bench, and tests agree
  * on the configs that affect correctness:
  *  - UTC session timezone (oracle parity);
  *  - shuffle partitions = cores (local mode; a cluster deploy would
  *    size this to 2-3× total executor cores, and AQE coalesces);
  *  - AQE on — at 100 TB it re-plans skewed joins and right-sizes
  *    post-shuffle partitions at runtime;
  *  - `nanosAsLong` so TIMESTAMP(NANOS) parquet (events.ts) is readable
  *    (normalized back to microsecond timestamps in [[Tables.events]]);
  *  - `inferTimestampNTZ` OFF so TIMESTAMP(MICROS, isAdjustedToUTC=
  *    false) parquet (the regenerated events.ts) reads as TimestampType
  *    — its raw micros are the UTC instant, exactly DuckDB's naive
  *    read, so `unix_micros(ts)` stays valid and oracle-aligned
  *    ([[Tables.events]] also casts NTZ defensively for sessions built
  *    without this config).
  */
object Sessions {
  def builder(master: String, cores: Int): SparkSession.Builder =
    SparkSession.builder()
      .master(master)
      .withExtensions(new graft.plans.GraftExtensions)
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false")

  def local(cores: Int): SparkSession = {
    val s = builder(s"local[$cores]", cores).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
