package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Bucketing

/** Co-located bucketed joins must plan WITHOUT a shuffle exchange —
  * the point of pre-bucketing fact tables on their join key. */
class BucketingSpec extends AnyFunSuite {
  lazy val spark = {
    val wh = Files.createTempDirectory("graft_wh").toString
    val s = Sessions.builder("local[4]", 4)
      .config("spark.sql.warehouse.dir", wh)
      // derby metastore for saveAsTable in tests
      .config("javax.jdo.option.ConnectionURL",
        s"jdbc:derby:;databaseName=$wh/metastore_db;create=true")
      // tiny SF would auto-broadcast and bypass the bucketed path we
      // are asserting (at fact scale broadcast is not an option)
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  test("bucketed orders ⋈ lineitem joins with no shuffle exchange") {
    val sf = "/root/testdata/sf0.001"
    Bucketing.writeBucketed(
      Tables.orders(spark, sf).select("o_orderkey", "o_totalprice", "o_orderstatus")
        .withColumnRenamed("o_orderkey", "l_orderkey"),
      "orders_b", "l_orderkey", buckets = 8)
    Bucketing.writeBucketed(
      Tables.lineitem(spark, sf).select("l_orderkey", "l_quantity", "l_extendedprice"),
      "lineitem_b", "l_orderkey", buckets = 8)

    val joined = Bucketing.colocatedJoin(spark, "orders_b", "lineitem_b", "l_orderkey")
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"bucketed join must not shuffle, plan was:\n$plan")

    // and it is still correct
    val viaBuckets = joined.agg(count(lit(1))).collect().head.getLong(0)
    val o = Tables.orders(spark, sf)
    val li = Tables.lineitem(spark, sf)
    val direct = o.join(li, o("o_orderkey") === li("l_orderkey")).count()
    assert(viaBuckets == direct)
  }
}
