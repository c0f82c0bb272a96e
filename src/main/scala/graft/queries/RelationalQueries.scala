package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Tables

/** The relational operator inventory (SURVEY.md §2) re-expressed over
  * the driver's TPC-H-ish testdata. Each query mirrors one or more of
  * the reference's 11 analysis queries / pipeline operators; the
  * SURVEY §2 operator ids covered are noted per query.
  *
  * Scale notes are inline; general rules applied everywhere:
  *  - aggregations are partial (map-side combine) by construction;
  *  - joins are plain equi joins — Catalyst/AQE picks broadcast vs
  *    shuffled by size, which is the right call at 100 TB too;
  *  - every query's plan was reviewed with `.explain("formatted")` for
  *    parquet pushdown + whole-stage codegen (see PlanSpec).
  */
object RelationalQueries {

  private def dec(c: Column, p: Int, s: Int): Column = c.cast(DecimalType(p, s))
  /** Exact money sum: decimal-aggregate then one cast to double. */
  private def dsum(c: Column): Column = sum(dec(c, 12, 2)).cast("double")

  // ---------------------------------------------------------------
  // q01 — global financial overview (Query 1 analog; A9/A8/A3).
  // Reference: `Analysis/Big query/reveunue_metrics_bigQueries.sql:1-8`.
  private def q01(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
    val billed  = sum(dec(col("l_extendedprice"), 12, 2))
    val revenue = sum(dec(col("l_extendedprice"), 12, 2) * (lit(1) - dec(col("l_discount"), 4, 2)))
    li.agg(
      dsum(col("l_quantity")).as("sum_qty"),
      billed.cast("double").as("total_billed"),
      revenue.cast("double").as("total_revenue"),
      (revenue.cast("double") / billed.cast("double") * 100).as("collection_rate_pct"))
  }
  private val q01Sql =
    """SELECT CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
      | CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS total_billed,
      | CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS total_revenue,
      | CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE)
      |   / CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) * 100 AS collection_rate_pct
      |FROM lineitem""".stripMargin

  // ---------------------------------------------------------------
  // q02 — grouped pricing summary (TPC-H Q1 shape; A3/A4/A5, O1).
  private def q02(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
    li.groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_base_price"),
        sum(dec(col("l_extendedprice"), 12, 2) * (lit(1) - dec(col("l_discount"), 4, 2)))
          .cast("double").as("sum_disc_price"),
        (sum(dec(col("l_quantity"), 12, 2)).cast("double") / count(lit(1))).as("avg_qty"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }
  private val q02Sql =
    """SELECT l_returnflag, l_linestatus,
      | CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
      | CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
      | CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS sum_disc_price,
      | CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
      | COUNT(*) AS count_order
      |FROM lineitem GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  // ---------------------------------------------------------------
  // q03 — revenue by segment (Query 2 analog; J6/A3/A4). Both sides are
  // fact-scale at 100 TB → plain equi join, AQE decides the strategy.
  private def q03(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
    val c = Tables.customer(s, dir)
    o.join(c, o("o_custkey") === c("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(
        dsum(col("o_totalprice")).as("total_billed"),
        (dsum(col("o_totalprice")) / count(lit(1))).as("avg_order_value"),
        count(lit(1)).as("n_orders"))
      .orderBy(col("c_mktsegment"))
  }
  private val q03Sql =
    """SELECT c_mktsegment,
      | CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total_billed,
      | CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_order_value,
      | COUNT(*) AS n_orders
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin

  // ---------------------------------------------------------------
  // q04 — monthly trends (Query 3 analog; X8/A3/O1).
  private def q04(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
    o.groupBy(
        year(col("o_orderdate")).as("order_year"),
        month(col("o_orderdate")).as("order_month"))
      .agg(dsum(col("o_totalprice")).as("monthly_billed"), count(lit(1)).as("n_orders"))
      .orderBy(col("order_year"), col("order_month"))
  }
  private val q04Sql =
    """SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS INTEGER) AS order_year,
      | CAST(EXTRACT(MONTH FROM o_orderdate) AS INTEGER) AS order_month,
      | CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS monthly_billed,
      | COUNT(*) AS n_orders
      |FROM orders GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  // ---------------------------------------------------------------
  // q05 — conditional rates by priority (Query 4 analog; A7/A8).
  // Reference: `Analysis/Big query/claim_performance.sql`.
  private def q05(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
    val nF = sum(when(col("o_orderstatus") === "F", 1).otherwise(0))
    val nO = sum(when(col("o_orderstatus") === "O", 1).otherwise(0))
    o.groupBy(col("o_orderpriority"))
      .agg(
        count(lit(1)).as("total_orders"),
        nF.as("finished_orders"),
        nO.as("open_orders"),
        (nF.cast("double") / count(lit(1)) * 100).as("finished_rate_pct"),
        (nO.cast("double") / count(lit(1)) * 100).as("open_rate_pct"))
      .orderBy(desc("total_orders"), col("o_orderpriority"))
  }
  private val q05Sql =
    """SELECT o_orderpriority,
      | COUNT(*) AS total_orders,
      | CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS finished_orders,
      | CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS open_orders,
      | CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*) * 100 AS finished_rate_pct,
      | CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*) * 100 AS open_rate_pct
      |FROM orders GROUP BY o_orderpriority
      |ORDER BY total_orders DESC, o_orderpriority""".stripMargin

  // ---------------------------------------------------------------
  // q06 — mix analysis (Query 6 analog; A6 exact count-distinct).
  private def q06(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(s, dir)
    e.groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("n_unique_users"), count(lit(1)).as("n_events"))
      .orderBy(desc("n_unique_users"), col("event_type"))
  }
  private val q06Sql =
    """SELECT event_type, COUNT(DISTINCT user_id) AS n_unique_users, COUNT(*) AS n_events
      |FROM events GROUP BY event_type
      |ORDER BY n_unique_users DESC, event_type""".stripMargin

  // ---------------------------------------------------------------
  // q07 — filtered global average (Query 7 analog; F7/A4/A9). The
  // filter reaches the parquet scan (PushedFilters).
  private def q07(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(s, dir)
    e.filter(col("event_type") === "purchase")
      .agg(
        (sum(dec(col("value"), 28, 9)).cast("double") / count(lit(1))).as("avg_purchase_value"),
        count(lit(1)).as("n_purchases"))
  }
  private val q07Sql =
    """SELECT CAST(SUM(CAST(value AS DECIMAL(28,9))) AS DOUBLE) / COUNT(*) AS avg_purchase_value,
      | COUNT(*) AS n_purchases
      |FROM events WHERE event_type = 'purchase'""".stripMargin

  // ---------------------------------------------------------------
  // q08 — filtered global sum (Query 8 analog; F7/A9).
  private def q08(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
    o.filter(col("o_orderstatus") === "F" && col("o_orderpriority") === "1-URGENT")
      .agg(dsum(col("o_totalprice")).as("total_writeoff"), count(lit(1)).as("n_orders"))
  }
  private val q08Sql =
    """SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total_writeoff,
      | COUNT(*) AS n_orders
      |FROM orders WHERE o_orderstatus = 'F' AND o_orderpriority = '1-URGENT'""".stripMargin

  // ---------------------------------------------------------------
  // q09 — top-20 customer lifetime value (Query 9 analog; J6/A3/A6/O2).
  // Spark plans TakeOrderedAndProject → no global sort of the aggregate.
  private def q09(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
    val c = Tables.customer(s, dir)
    o.join(c, o("o_custkey") === c("c_custkey"))
      .groupBy(col("c_custkey"), col("c_name"))
      .agg(
        dsum(col("o_totalprice")).as("lifetime_value"),
        countDistinct(col("o_orderkey")).as("n_orders"))
      .orderBy(desc("lifetime_value"), col("c_custkey"))
      .limit(20)
  }
  private val q09Sql =
    """SELECT c_custkey, c_name,
      | CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS lifetime_value,
      | COUNT(DISTINCT o_orderkey) AS n_orders
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |GROUP BY c_custkey, c_name
      |ORDER BY lifetime_value DESC, c_custkey LIMIT 20""".stripMargin

  // ---------------------------------------------------------------
  // q10 — per-part-brand profitability (Query 10 analog; J6/A3-A8).
  private def q10(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
    val p = Tables.part(s, dir)
    val billed  = sum(dec(col("l_extendedprice"), 12, 2))
    val revenue = sum(dec(col("l_extendedprice"), 12, 2) * (lit(1) - dec(col("l_discount"), 4, 2)))
    li.join(p, li("l_partkey") === p("p_partkey"))
      .groupBy(col("p_brand"))
      .agg(
        count(col("l_orderkey")).as("n_times_sold"),
        billed.cast("double").as("total_billed"),
        (billed.cast("double") / count(lit(1))).as("avg_billed"),
        revenue.cast("double").as("total_revenue"),
        (revenue.cast("double") / billed.cast("double") * 100).as("collection_rate_pct"))
      .orderBy(desc("total_revenue"), col("p_brand"))
  }
  private val q10Sql =
    """SELECT p_brand,
      | COUNT(l_orderkey) AS n_times_sold,
      | CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS total_billed,
      | CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_billed,
      | CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS total_revenue,
      | CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE)
      |   / CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) * 100 AS collection_rate_pct
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |GROUP BY p_brand ORDER BY total_revenue DESC, p_brand""".stripMargin

  // ---------------------------------------------------------------
  // q11 — seasonal volume (Query 11 analog; X8/A6).
  private def q11(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
    o.groupBy(
        year(col("o_orderdate")).as("order_year"),
        quarter(col("o_orderdate")).as("order_quarter"),
        month(col("o_orderdate")).as("order_month"))
      .agg(countDistinct(col("o_custkey")).as("n_unique_customers"), count(lit(1)).as("n_orders"))
      .orderBy(col("order_year"), col("order_quarter"), col("order_month"))
  }
  private val q11Sql =
    """SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS INTEGER) AS order_year,
      | CAST(EXTRACT(QUARTER FROM o_orderdate) AS INTEGER) AS order_quarter,
      | CAST(EXTRACT(MONTH FROM o_orderdate) AS INTEGER) AS order_month,
      | COUNT(DISTINCT o_custkey) AS n_unique_customers, COUNT(*) AS n_orders
      |FROM orders GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin

  // ---------------------------------------------------------------
  // q12 — union-by-name with missing columns (U1; the `Updated_Date`
  // drift analog — `unionByName(allowMissingColumns = true)`).
  private def q12(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(s, dir).select(
      col("c_custkey").as("entity_id"), col("c_name").as("entity_name"),
      col("c_acctbal").as("acctbal"), lit("customer").as("entity_kind"))
    val sup = Tables.supplier(s, dir).select(
      col("s_suppkey").as("entity_id"), col("s_name").as("entity_name"),
      lit("supplier").as("entity_kind"))
    c.unionByName(sup, allowMissingColumns = true)
      .orderBy(col("entity_kind"), col("entity_id"))
  }
  private val q12Sql =
    """SELECT c_custkey AS entity_id, c_name AS entity_name, c_acctbal AS acctbal,
      |       'customer' AS entity_kind FROM customer
      |UNION ALL
      |SELECT s_suppkey, s_name, CAST(NULL AS DOUBLE), 'supplier' FROM supplier
      |ORDER BY entity_kind, entity_id""".stripMargin

  // ---------------------------------------------------------------
  // q13 — anti join (F4/U2: the NOT-IN orphan idiom as left_anti —
  // no shuffle of a NOT IN subquery, a proper anti hash join).
  private def q13(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(s, dir)
    val o95 = Tables.orders(s, dir)
      .filter(year(col("o_orderdate")) === 1995)
      .select(col("o_custkey").as("c_custkey"))
    c.join(o95, Seq("c_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
      .orderBy(col("c_custkey"))
  }
  private val q13Sql =
    """SELECT c_custkey, c_name, c_mktsegment FROM customer
      |WHERE c_custkey NOT IN (
      |  SELECT o_custkey FROM orders WHERE EXTRACT(YEAR FROM o_orderdate) = 1995)
      |ORDER BY c_custkey""".stripMargin

  // ---------------------------------------------------------------
  // q14 — left join + null-match audit (J3/F4/A10: the orphan-count
  // referential-integrity check, `python/dimensional_modeling.py:86-92`).
  private def q14(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
    val rich = Tables.customer(s, dir)
      .filter(col("c_acctbal") > 5000).select(col("c_custkey"))
    o.join(rich, o("o_custkey") === rich("c_custkey"), "left")
      .groupBy(col("o_orderstatus"))
      .agg(
        count(lit(1)).as("n_orders"),
        sum(when(col("c_custkey").isNull, 1).otherwise(0)).as("n_orphans"))
      .orderBy(col("o_orderstatus"))
  }
  private val q14Sql =
    """SELECT o_orderstatus, COUNT(*) AS n_orders,
      | CAST(SUM(CASE WHEN c_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_orphans
      |FROM orders LEFT JOIN (SELECT c_custkey FROM customer WHERE c_acctbal > 5000) rich
      |  ON o_custkey = c_custkey
      |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin

  // ---------------------------------------------------------------
  // q15 — distinct projection with null drop (F6/A2).
  private def q15(s: SparkSession, dir: String): DataFrame =
    Tables.part(s, dir).select(col("p_brand"), col("p_type"))
      .na.drop().distinct().orderBy(col("p_brand"), col("p_type"))
  private val q15Sql =
    """SELECT DISTINCT p_brand, p_type FROM part
      |WHERE p_brand IS NOT NULL AND p_type IS NOT NULL
      |ORDER BY p_brand, p_type""".stripMargin

  // ---------------------------------------------------------------
  // q16 — scalar string functions (X1/X3/X9/X10; P2/P3).
  // initcap on single-word segments == the upper-head/lower-tail
  // composition in the oracle (DuckDB 1.0 has no initcap).
  private def q16(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(s, dir)
    c.select(
        col("c_custkey"),
        regexp_replace(col("c_name"), "\\D", "").as("name_digits"),
        initcap(lower(col("c_mktsegment"))).as("segment_title"),
        concat(upper(regexp_replace(col("c_mktsegment"), "AUTO", "")),
          lit("-"), col("c_custkey").cast("string")).as("unified_id"),
        coalesce(nullif(col("c_mktsegment"), lit("MACHINERY")), lit("Unknown")).as("segment_or_unknown"))
      .orderBy(col("c_custkey"))
  }
  private val q16Sql =
    """SELECT c_custkey,
      | regexp_replace(c_name, '\D', '', 'g') AS name_digits,
      | upper(substr(lower(c_mktsegment), 1, 1)) || substr(lower(c_mktsegment), 2) AS segment_title,
      | upper(regexp_replace(c_mktsegment, 'AUTO', '', 'g')) || '-' || CAST(c_custkey AS VARCHAR) AS unified_id,
      | COALESCE(NULLIF(c_mktsegment, 'MACHINERY'), 'Unknown') AS segment_or_unknown
      |FROM customer ORDER BY c_custkey""".stripMargin

  // ---------------------------------------------------------------
  // q17 — scalar date functions (X4/X5/X7/X8).
  private def q17(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
    val d = to_date(col("o_orderdate"))
    val asOf = to_date(lit("2002-01-01"))
    o.select(
        col("o_orderkey"),
        year(d).as("order_year"),
        month(d).as("order_month"),
        quarter(d).as("order_quarter"),
        date_format(d, "EEEE").as("order_dayname"),
        datediff(asOf, d).cast("long").as("days_to_asof"),
        (year(asOf) - year(d) -
          when(month(asOf) < month(d) ||
            (month(asOf) === month(d) && dayofmonth(asOf) < dayofmonth(d)), 1)
            .otherwise(0)).cast("long").as("age_years"))
      .orderBy(col("o_orderkey"))
  }
  private val q17Sql =
    """SELECT o_orderkey,
      | CAST(EXTRACT(YEAR FROM o_orderdate) AS INTEGER) AS order_year,
      | CAST(EXTRACT(MONTH FROM o_orderdate) AS INTEGER) AS order_month,
      | CAST(EXTRACT(QUARTER FROM o_orderdate) AS INTEGER) AS order_quarter,
      | dayname(CAST(o_orderdate AS DATE)) AS order_dayname,
      | CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '2002-01-01') AS BIGINT) AS days_to_asof,
      | CAST(2002 - EXTRACT(YEAR FROM o_orderdate)
      |   - CASE WHEN 1 < EXTRACT(MONTH FROM o_orderdate)
      |            OR (1 = EXTRACT(MONTH FROM o_orderdate) AND 1 < EXTRACT(DAY FROM o_orderdate))
      |          THEN 1 ELSE 0 END AS BIGINT) AS age_years
      |FROM orders ORDER BY o_orderkey""".stripMargin

  val all: Seq[QueryDef] = Seq(
    QueryDef("q01_global_agg", q01, Some(q01Sql)),
    QueryDef("q02_groupby_agg", q02, Some(q02Sql)),
    QueryDef("q03_join_groupby", q03, Some(q03Sql)),
    QueryDef("q04_monthly_trends", q04, Some(q04Sql)),
    QueryDef("q05_conditional_rates", q05, Some(q05Sql)),
    QueryDef("q06_distinct_mix", q06, Some(q06Sql)),
    QueryDef("q07_filtered_avg", q07, Some(q07Sql)),
    QueryDef("q08_filtered_sum", q08, Some(q08Sql)),
    QueryDef("q09_top20_ltv", q09, Some(q09Sql)),
    QueryDef("q10_brand_profitability", q10, Some(q10Sql)),
    QueryDef("q11_seasonal_volume", q11, Some(q11Sql)),
    QueryDef("q12_union_by_name", q12, Some(q12Sql)),
    QueryDef("q13_anti_join", q13, Some(q13Sql)),
    QueryDef("q14_left_join_orphans", q14, Some(q14Sql)),
    QueryDef("q15_distinct_project", q15, Some(q15Sql)),
    QueryDef("q16_string_funcs", q16, Some(q16Sql)),
    QueryDef("q17_date_funcs", q17, Some(q17Sql)),
  )
}
