package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-quality profiling — the first-class form of the reference's
  * inline validation (`python/dimensional_modeling.py:80-100`,
  * `python/load.py:115-119`): null profiles, domain checks,
  * referential integrity, and duplicate rates, each as ONE aggregation
  * pass (no per-column jobs, no driver loops — a 100 TB profile is a
  * single scan).
  */
object DataQuality {

  /** Per-column null counts in one pass: (column_name, n_rows, n_nulls). */
  def nullProfile(df: DataFrame, cols: Seq[String]): DataFrame = {
    val aggs = count(lit(1)).as("_n") +:
      cols.map(c => sum(when(col(c).isNull, 1).otherwise(0)).as(s"_null_$c"))
    val row = df.agg(aggs.head, aggs.tail: _*)
    val stackArgs = cols.map(c => s"'$c', _null_$c").mkString(", ")
    row.selectExpr(s"stack(${cols.length}, $stackArgs) as (column_name, n_nulls)", "_n as n_rows")
      .select(col("column_name"), col("n_rows"), col("n_nulls"))
  }

  /** Rows whose `c` falls outside the allowed domain (nulls excluded). */
  def domainViolations(df: DataFrame, c: String, allowed: Seq[String]): DataFrame =
    df.filter(col(c).isNotNull && !col(c).isin(allowed: _*))

  /** Orphan fact rows: fact keys with no match in the dimension
    * (the reference's referential-integrity check, F4/A10). */
  def orphans(fact: DataFrame, dim: DataFrame, factKey: String, dimKey: String): DataFrame =
    fact.join(dim.select(col(dimKey).as(factKey)).distinct(),
      Seq(factKey), "left_anti")

  /** Per-group k-sigma outlier counts in EXACT integer arithmetic:
    * `|x − mean| > k·σ_pop` evaluated as
    * `(n·x − S1)² > k²·(n·S2 − S1²)` over DECIMAL(38,0) — no float
    * mean, no sqrt, no division, so the flags are bit-identical in any
    * engine (the q89 oracle recomputes them in DuckDB HUGEINT).
    * `valueInt` must be integer-valued — quantize doubles upstream
    * (e.g. `round(value·1e6)`); the squares stay within 38 digits for
    * |values| up to ~1e9 at billions of rows per group.
    *
    * Shape (100 TB): two corpus passes — a partially-aggregated stats
    * pass (one row per group) and a flagging pass with the stats
    * broadcast back onto the corpus. No window, no sort, no hot
    * reducer: both aggregations combine map-side. */
  def sigmaOutlierCounts(df: DataFrame, groupCols: Seq[String],
      valueInt: Column, sigmas: Int): DataFrame = {
    require(groupCols.nonEmpty, "groupCols must be non-empty")
    require(sigmas > 0, s"sigmas must be positive, got $sigmas")
    val d38 = "decimal(38,0)"
    val stats = df.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("__n"),
        sum(valueInt.cast(d38)).as("__s1"),
        sum((valueInt.cast("decimal(19,0)") * valueInt.cast("decimal(19,0)"))
          .cast(d38)).as("__s2"))
    val n = col("__n").cast(d38)
    val x = valueInt.cast(d38)
    val dev = n * x - col("__s1")
    val bound = lit(sigmas.toLong * sigmas).cast(d38) *
      (n * col("__s2") - col("__s1") * col("__s1"))
    df.join(broadcast(stats), groupCols)
      .groupBy(groupCols.map(col): _*)
      .agg(max(col("__n")).as("n_rows"),
        count(when(dev * dev > bound, 1)).as("n_outliers"))
  }

  /** Duplicate statistics on a key set: one row —
    * (n_rows, n_distinct_keys, n_duplicate_rows). */
  def duplicateStats(df: DataFrame, keys: Seq[String]): DataFrame = {
    val perKey = df.groupBy(keys.map(col): _*).agg(count(lit(1)).as("_c"))
    perKey.agg(
      sum(col("_c")).as("n_rows"),
      count(lit(1)).as("n_distinct_keys"),
      sum(col("_c") - 1).as("n_duplicate_rows"))
  }
}
