package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One driver-visible query: a Spark implementation plus (when the
  * semantics are ANSI-SQL-expressible) an equivalent DuckDB oracle over
  * the same parquet tables. Column names/types must match exactly —
  * the driver sorts columns by name and hash-compares values.
  *
  * Cross-engine float determinism: every SUM/AVG over doubles goes
  * through `CAST(SUM(CAST(x AS DECIMAL(p,s))) AS DOUBLE)` — decimal
  * aggregation is exact in both engines, so the final double is
  * bit-identical no matter the aggregation order/parallelism.
  */
final case class QueryDef(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String])
