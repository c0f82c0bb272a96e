package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.{DataQuality, Funnel, Resample}

/** Event-log analytics (q83–q84, q89, q92–q93): ordered funnel
  * conversion, gap-filled daily series, trailing range-frame windows,
  * and exact-arithmetic trend slopes over the `events` table — the
  * product-analytics surface of the engine (the reference's claim
  * lifecycle — submitted → adjudicated → paid — is the same ordered
  * funnel; its monthly-trend SQL is the same series, minus the zeros).
  *
  * Cross-engine determinism: timestamps compare as epoch MICROseconds
  * on both sides (Tables.events truncates parquet nanos exactly like
  * DuckDB's `epoch_us`), counts are integers, and the one double
  * output per query is a single division of two exact integers.
  */
object EventQueries {

  // ---------------------------------------------------------------
  // q83 — view → click → purchase funnel: per-stage entity counts
  // where stage k must happen at-or-after the first in-order reach of
  // stage k-1. One shuffle on user_id (see [[Funnel]] for the
  // per-entity array shape); the oracle spells the same semantics as
  // three chained min-after-min CTEs.
  private def q83(s: SparkSession, dir: String): DataFrame =
    Funnel.stageCounts(Tables.events(s, dir), "user_id",
      unix_micros(col("ts")), col("event_type"),
      Seq("view", "click", "purchase"))
  private val q83Sql =
    """WITH v AS (SELECT user_id, min(epoch_us(ts)) AS mv FROM events
      |           WHERE event_type = 'view' GROUP BY 1),
      |c AS (SELECT e.user_id, min(epoch_us(e.ts)) AS mc FROM events e
      |      JOIN v ON e.user_id = v.user_id
      |      WHERE e.event_type = 'click' AND epoch_us(e.ts) >= v.mv GROUP BY 1),
      |p AS (SELECT e.user_id, min(epoch_us(e.ts)) AS mp FROM events e
      |      JOIN c ON e.user_id = c.user_id
      |      WHERE e.event_type = 'purchase' AND epoch_us(e.ts) >= c.mc GROUP BY 1),
      |n AS (SELECT (SELECT count(*) FROM v) AS n1,
      |             (SELECT count(*) FROM c) AS n2,
      |             (SELECT count(*) FROM p) AS n3)
      |SELECT * FROM (
      |  SELECT 1 AS stage_ord, 'view' AS stage, n1 AS n_entities,
      |         CAST(n1 AS DOUBLE) / n1 AS pct_of_first FROM n
      |  UNION ALL SELECT 2, 'click', n2, CAST(n2 AS DOUBLE) / n1 FROM n
      |  UNION ALL SELECT 3, 'purchase', n3, CAST(n3 AS DOUBLE) / n1 FROM n)
      |ORDER BY stage_ord""".stripMargin

  // ---------------------------------------------------------------
  // q84 — gap-filled daily series: high-value events (value > 200 —
  // sparse enough that real zero-days exist at every SF) counted per
  // (day, event_type) over the FULL table's calendar span and type
  // domain, zeros explicit. The corpus is scanned once; the grid is
  // post-aggregation-sized (see [[Resample]]).
  private def q84(s: SparkSession, dir: String): DataFrame =
    Resample.gapFillDailyCounts(Tables.events(s, dir), col("ts"),
      Seq("event_type"), col("value") > 200)
  private val q84Sql =
    """WITH obs AS (SELECT CAST(ts AS DATE) AS day, event_type, count(*) AS n
      |             FROM events WHERE value > 200 GROUP BY 1, 2),
      |span AS (SELECT CAST(min(ts) AS DATE) AS lo, CAST(max(ts) AS DATE) AS hi
      |         FROM events),
      |cal AS (SELECT CAST(unnest(generate_series(CAST(lo AS TIMESTAMP),
      |          CAST(hi AS TIMESTAMP), INTERVAL 1 DAY)) AS DATE) AS day
      |        FROM span),
      |dims AS (SELECT DISTINCT event_type FROM events)
      |SELECT cal.day, dims.event_type, COALESCE(obs.n, 0) AS n_events
      |FROM cal CROSS JOIN dims
      |LEFT JOIN obs ON obs.day = cal.day AND obs.event_type = dims.event_type
      |ORDER BY 1, 2""".stripMargin

  // ---------------------------------------------------------------
  // q89 — per-type 3-sigma outlier counts with NO floating-point
  // statistics: values quantized to integer micros, the sigma test
  // evaluated as (n·x − S1)² > 9·(n·S2 − S1²) in DECIMAL(38,0) /
  // HUGEINT (see [[graft.operators.DataQuality.sigmaOutlierCounts]]).
  // Two corpus passes, stats broadcast back.
  private def q89(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.DataQuality
    DataQuality.sigmaOutlierCounts(Tables.events(s, dir), Seq("event_type"),
        round(col("value") * 1000000).cast("long"), sigmas = 3)
      .orderBy(col("event_type"))
  }
  private val q89Sql =
    """WITH x AS (SELECT event_type, CAST(round(value * 1000000) AS BIGINT) AS xi
      |           FROM events),
      |st AS (SELECT event_type, COUNT(*) AS n, SUM(CAST(xi AS HUGEINT)) AS s1,
      |       SUM(CAST(xi AS HUGEINT) * CAST(xi AS HUGEINT)) AS s2
      |       FROM x GROUP BY 1)
      |SELECT x.event_type, CAST(max(st.n) AS BIGINT) AS n_rows,
      |  COUNT(CASE WHEN (st.n * x.xi - st.s1) * (st.n * x.xi - st.s1)
      |                  > 9 * (st.n * st.s2 - st.s1 * st.s1) THEN 1 END)
      |    AS n_outliers
      |FROM x JOIN st USING (event_type)
      |GROUP BY 1 ORDER BY 1""".stripMargin

  // ---------------------------------------------------------------
  // q92 — trailing 7-day totals per event type: the RANGE frame on
  // the epoch day, which handles calendar gaps correctly (a missing
  // day shrinks the frame's row count, never its day span — where a
  // ROWS frame silently drifts). Integer-micro sums stay exact; see
  // [[graft.operators.Resample.trailingDaily]].
  private def q92(s: SparkSession, dir: String): DataFrame =
    Resample.trailingDaily(Tables.events(s, dir), col("ts"),
        Seq("event_type"), round(col("value") * 1000000).cast("long"),
        windowDays = 7)
      .orderBy(col("event_type"), col("day"))
  private val q92Sql =
    """WITH d AS (SELECT event_type, CAST(ts AS DATE) AS day,
      |             COUNT(*) AS n_events,
      |             CAST(SUM(CAST(round(value * 1000000) AS BIGINT)) AS BIGINT)
      |               AS day_total
      |           FROM events GROUP BY 1, 2)
      |SELECT event_type, day, n_events, day_total,
      |  CAST(SUM(day_total) OVER w AS BIGINT) AS trailing_total,
      |  CAST(COUNT(*) OVER w AS BIGINT) AS trailing_days
      |FROM d
      |WINDOW w AS (PARTITION BY event_type ORDER BY day
      |             RANGE BETWEEN INTERVAL 6 DAY PRECEDING AND CURRENT ROW)
      |ORDER BY event_type, day""".stripMargin

  // ---------------------------------------------------------------
  // q93 — per-type least-squares value trend: slope of micro-value
  // against the epoch day, all sums exact in DECIMAL(38,0)/HUGEINT —
  // the only floating point is the final casts and divisions, so the
  // slope is bit-identical cross-engine with no tolerance (see
  // [[graft.operators.DataQuality.trendSlopes]]). One shuffle.
  private def q93(s: SparkSession, dir: String): DataFrame =
    DataQuality.trendSlopes(Tables.events(s, dir), Seq("event_type"),
        unix_date(to_date(col("ts"))),
        round(col("value") * 1000000).cast("long"))
      .orderBy(col("event_type"))
  private val q93Sql =
    """WITH x AS (SELECT event_type,
      |    CAST(datediff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS HUGEINT) AS xd,
      |    CAST(CAST(round(value * 1000000) AS BIGINT) AS HUGEINT) AS yd
      |  FROM events),
      |s AS (SELECT event_type, CAST(COUNT(*) AS HUGEINT) AS n,
      |        SUM(xd) AS sx, SUM(yd) AS sy,
      |        SUM(xd * yd) AS sxy, SUM(xd * xd) AS sxx
      |      FROM x GROUP BY 1)
      |SELECT event_type, CAST(n AS BIGINT) AS n_rows,
      |  CASE WHEN n * sxx - sx * sx <> 0
      |       THEN CAST(n * sxy - sx * sy AS DOUBLE)
      |            / CAST(n * sxx - sx * sx AS DOUBLE) END AS slope,
      |  CAST(sy AS DOUBLE) / CAST(n AS DOUBLE) AS mean_y
      |FROM s ORDER BY event_type""".stripMargin

  // ---------------------------------------------------------------
  // q104 — event-type transition matrix: counts of (this event → the
  // same user's NEXT event) over per-user timelines, with the exit
  // probability per source state. One lead() window per user (the
  // q22 shuffle), then a tiny groupBy; the probability is one double
  // division of exact integers. The Markov-chain input every
  // journey/abandonment analysis starts from.
  private def q104(s: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val steps = Tables.events(s, dir)
      .withColumn("next_type", lead(col("event_type"), 1).over(w))
      .filter(col("next_type").isNotNull)
      .groupBy(col("event_type"), col("next_type"))
      .agg(count(lit(1)).as("n_transitions"))
    val totals = org.apache.spark.sql.expressions.Window
      .partitionBy(col("event_type"))
    steps
      .withColumn("p_transition", col("n_transitions").cast("double")
        / sum(col("n_transitions")).over(totals).cast("double"))
      .orderBy(col("event_type"), col("next_type"))
  }
  private val q104Sql =
    """WITH steps AS (
      |  SELECT event_type,
      |    lead(event_type, 1) OVER (PARTITION BY user_id
      |                              ORDER BY ts, event_id) AS next_type
      |  FROM events),
      |t AS (SELECT event_type, next_type, COUNT(*) AS n_transitions
      |      FROM steps WHERE next_type IS NOT NULL GROUP BY 1, 2)
      |SELECT event_type, next_type, n_transitions,
      |  CAST(n_transitions AS DOUBLE)
      |    / CAST(SUM(n_transitions) OVER (PARTITION BY event_type) AS DOUBLE)
      |    AS p_transition
      |FROM t ORDER BY event_type, next_type""".stripMargin

  // ---------------------------------------------------------------
  // q105 — weekly cohort retention: users bucketed by first-activity
  // week, distinct actives per (cohort, weeks-since-start). Two
  // shuffles (first-seen per user, then the cohort grid) and a double
  // division of exact integers for the retention rate — the matrix
  // behind every retention curve. Weeks are epoch-weeks
  // (⌊epoch_day/7⌋): no ISO week-year boundary ambiguity in either
  // engine.
  private def q105(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(s, dir)
      .select(col("user_id"),
        // floor on BOTH sides: DuckDB's `//` truncates toward zero, so
        // the oracle spells floor(d / 7.0) explicitly — otherwise
        // pre-1970 negative epoch days would land in different weeks
        floor(unix_date(to_date(col("ts"))) / lit(7)).as("abs_wk"))
    val first = e.groupBy(col("user_id"))
      .agg(min(col("abs_wk")).as("cohort_wk"))
    val active = e.select(col("user_id"), col("abs_wk")).distinct()
    val cohortSizes = first.groupBy(col("cohort_wk"))
      .agg(count(lit(1)).as("n_cohort"))
    active.join(first, "user_id")
      .groupBy(col("cohort_wk"),
        (col("abs_wk") - col("cohort_wk")).as("weeks_since"))
      .agg(countDistinct(col("user_id")).as("n_active"))
      .join(broadcast(cohortSizes), "cohort_wk")
      .withColumn("retention",
        col("n_active").cast("double") / col("n_cohort").cast("double"))
      .orderBy(col("cohort_wk"), col("weeks_since"))
  }
  private val q105Sql =
    """WITH e AS (SELECT user_id,
      |    CAST(floor(datediff('day', DATE '1970-01-01', CAST(ts AS DATE)) / 7.0) AS BIGINT) AS abs_wk
      |  FROM events),
      |f AS (SELECT user_id, MIN(abs_wk) AS cohort_wk FROM e GROUP BY 1),
      |sz AS (SELECT cohort_wk, COUNT(*) AS n_cohort FROM f GROUP BY 1),
      |a AS (SELECT DISTINCT user_id, abs_wk FROM e)
      |SELECT f.cohort_wk, a.abs_wk - f.cohort_wk AS weeks_since,
      |  COUNT(DISTINCT a.user_id) AS n_active,
      |  CAST(max(sz.n_cohort) AS BIGINT) AS n_cohort,
      |  CAST(COUNT(DISTINCT a.user_id) AS DOUBLE)
      |    / CAST(max(sz.n_cohort) AS DOUBLE) AS retention
      |FROM a JOIN f USING (user_id) JOIN sz ON sz.cohort_wk = f.cohort_wk
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  // ---------------------------------------------------------------
  // q106 — robust (median/MAD) outlier counts per event type: the
  // 50%-breakdown complement to q89's moment-based sigma test (a mean
  // and variance move with the very outliers they hunt; the median
  // doesn't). All statistics are order statistics / single
  // interpolations — the q39-proven exact-percentile pair — so the
  // doubles hash-match with no integer quantization at all (see
  // [[graft.operators.DataQuality.madOutlierCounts]]).
  private def q106(s: SparkSession, dir: String): DataFrame =
    DataQuality.madOutlierCounts(Tables.events(s, dir), Seq("event_type"),
        col("value"), k = 3.0)
      .orderBy(col("event_type"))
  private val q106Sql =
    """WITH med AS (SELECT event_type, quantile_cont(value, 0.5) AS med
      |             FROM events GROUP BY 1),
      |dev AS (SELECT e.event_type, abs(e.value - med.med) AS absdev, med.med
      |        FROM events e JOIN med USING (event_type)),
      |mad AS (SELECT event_type, quantile_cont(absdev, 0.5) AS mad
      |        FROM dev GROUP BY 1)
      |SELECT dev.event_type, COUNT(*) AS n_rows,
      |  max(dev.med) AS med, max(mad.mad) AS mad,
      |  COUNT(CASE WHEN dev.absdev > 3.0 * mad.mad THEN 1 END) AS n_outliers
      |FROM dev JOIN mad USING (event_type)
      |GROUP BY 1 ORDER BY 1""".stripMargin

  val all: Seq[QueryDef] = Seq(
    QueryDef("q104_transition_matrix", q104, Some(q104Sql)),
    QueryDef("q106_mad_outliers", q106, Some(q106Sql)),
    QueryDef("q105_cohort_retention", q105, Some(q105Sql)),
    QueryDef("q83_funnel", q83, Some(q83Sql)),
    QueryDef("q84_gap_fill", q84, Some(q84Sql)),
    QueryDef("q89_sigma_outliers", q89, Some(q89Sql)),
    QueryDef("q92_trailing_window", q92, Some(q92Sql)),
    QueryDef("q93_trend_slope", q93, Some(q93Sql)),
  )
}
