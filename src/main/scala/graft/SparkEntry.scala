package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Queries are registered in themed modules, each pairing a Spark
  * implementation with a DuckDB oracle (see [[graft.queries.QueryDef]]):
  *  - [[RelationalQueries]]  q01–q17: the reference's 11 analysis
  *    queries + projection/filter/join/union/scalar-function inventory
  *  - [[LifecycleQueries]]   q18–q20: surrogate keys + SCD Type 2
  *  - [[WindowQueries]]      q21–q24, q54, q99–q100: per-user windows,
  *    sessionization (explicit + native session_window), JSON,
  *    interval join, ratio-to-report
  *  - [[TextQueries]]        q25–q33: text stats/dedup/multimodal
  *  - [[SimilarityQueries]]  q34–q36: ANN + embedding near-dup
  *  - [[ExtendedQueries]]    q37–q44: rollup/semi/percentile/pivot/
  *    DQ-profile/as-of/ranking
  *  - [[SqlQueries]]         q46: the `spark.sql` front door
  *  - [[CurationQueries]]    q47–q50: skew-safe aggs, deterministic
  *    sampling/caps, stable hash surrogate keys
  *  - [[EventQueries]]       q83–q84, q89, q92–q93: ordered funnel,
  *    gap-filled series, sigma outliers, trailing RANGE-frame windows,
  *    exact trend slopes
  *  - [[ScaleQueries]]       q82, q85, q87–q88, q94–q95: salted join,
  *    histogram+CDF, CUBE, weighted deterministic sample, incremental
  *    partial-aggregate rollup, quantile binning
  */
object SparkEntry {

  val registry: Seq[QueryDef] =
    RelationalQueries.all ++ LifecycleQueries.all ++ WindowQueries.all ++
      TextQueries.all ++ SimilarityQueries.all ++ ExtendedQueries.all ++
      SqlQueries.all ++ CurationQueries.all ++ VocabQueries.all ++
      EventQueries.all ++ ScaleQueries.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q01_global_agg")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map(q => q.name -> q.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    registry.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
