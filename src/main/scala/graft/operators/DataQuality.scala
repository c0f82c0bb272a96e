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
