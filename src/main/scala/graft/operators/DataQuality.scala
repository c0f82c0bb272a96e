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

  /** Zero-extra-pass validation counts — the reference's per-stage
    * row-count logging (SURVEY.md §2 A10, `extraction.py:37,46,108`)
    * done Spark-natively: `Dataset.observe` attaches a CollectMetrics
    * node, so the row count and per-column null counts accumulate
    * DURING whatever action consumes the frame (typically the write) —
    * no second scan, no extra job. Read the results from the
    * `Observation` after the action:
    * {{{
    * val obs = Observation("stage")
    * DataQuality.observeValidation(df, obs, Seq("k")).write.parquet(p)
    * obs.get("n_rows")  // counted during the write itself
    * }}}
    * At 100 TB this is the difference between free validation and a
    * second full read of the stage output. */
  def observeValidation(df: DataFrame, obs: org.apache.spark.sql.Observation,
      nullCheckCols: Seq[String]): DataFrame =
    df.observe(obs, count(lit(1)).as("n_rows"),
      nullCheckCols.map(c =>
        count(when(col(c).isNull, 1)).as(s"n_null_$c")): _*)

  /** Per-group least-squares trend slope with NO floating-point
    * accumulation — the q89 discipline applied to regression:
    * `slope = (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²)` with every sum
    * carried in DECIMAL(38,0) (exact, order-independent, mergeable
    * map-side partials), so the only floating point is the two final
    * casts and one division — bit-identical in any IEEE engine.
    * Unordered double SUMs would differ in the last ulp between
    * engines and partitionings; exact integer sums cannot.
    *
    * `xInt`/`yInt` must be integer-valued columns (e.g. epoch days and
    * micro-units); the caller bounds their magnitude so the decimal
    * products stay under 10^38 (epoch-day x and micro y hold to
    * ~10^15 rows per group). One shuffle — the groupBy.
    *
    * Returns (groups..., n_rows, slope, mean_y); slope is NULL for a
    * degenerate group (all x equal — zero denominator). */
  def trendSlopes(df: DataFrame, groupCols: Seq[String],
      xInt: Column, yInt: Column): DataFrame = {
    require(groupCols.nonEmpty, "groupCols must be non-empty")
    val d38 = "decimal(38,0)"
    val x = xInt.cast("decimal(19,0)")
    val y = yInt.cast("decimal(19,0)")
    val agg = df.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).cast(d38).as("__n"),
        sum(x.cast(d38)).as("__sx"), sum(y.cast(d38)).as("__sy"),
        sum((x * y).cast(d38)).as("__sxy"),
        sum((x * x).cast(d38)).as("__sxx"))
    val num = (col("__n") * col("__sxy") - col("__sx") * col("__sy")).cast(d38)
    val den = (col("__n") * col("__sxx") - col("__sx") * col("__sx")).cast(d38)
    agg.select(groupCols.map(col) ++ Seq(
      col("__n").cast("long").as("n_rows"),
      when(den =!= 0, num.cast("double") / den.cast("double")).as("slope"),
      (col("__sy").cast("double") / col("__n").cast("double")).as("mean_y")): _*)
  }

  /** Per-group MEDIAN/MAD outlier counts — the robust complement to
    * [[sigmaOutlierCounts]]: mean/variance move with the outliers they
    * hunt (masking), while the median and the median absolute
    * deviation have a 50% breakdown point. Flags
    * `|x − median| > k·MAD`.
    *
    * Cross-engine exactness without integer tricks: every statistic
    * here is an ORDER STATISTIC or a single interpolation
    * (`percentile` ≡ DuckDB `quantile_cont`, the q39-proven pair), and
    * the comparison arithmetic is one subtraction/abs/multiply per
    * row — no accumulation order anywhere, so doubles match bit-exact.
    *
    * Cost: two grouped percentile aggregations plus one counting pass
    * (exact two-level medians need them); the tiny median/MAD frames
    * broadcast back, the corpus never shuffles to join them. */
  def madOutlierCounts(df: DataFrame, groupCols: Seq[String],
      valueCol: Column, k: Double): DataFrame = {
    require(groupCols.nonEmpty, "groupCols must be non-empty")
    require(k > 0, s"k must be positive, got $k")
    val med = df.groupBy(groupCols.map(col): _*)
      .agg(percentile(valueCol, lit(0.5)).as("med"))
    val dev = df.join(broadcast(med), groupCols)
      .withColumn("__absdev", abs(valueCol - col("med")))
    val mad = dev.groupBy(groupCols.map(col): _*)
      .agg(percentile(col("__absdev"), lit(0.5)).as("mad"))
    dev.join(broadcast(mad), groupCols)
      .groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n_rows"),
        max(col("med")).as("med"), max(col("mad")).as("mad"),
        count(when(col("__absdev") > lit(k) * col("mad"), 1))
          .as("n_outliers"))
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
