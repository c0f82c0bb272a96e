package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Bucketing

/** Co-located bucketed joins must plan WITHOUT a shuffle exchange —
  * the point of pre-bucketing fact tables on their join key. */
class BucketingSpec extends AnyFunSuite {
  // Shared-session reality: all suites run in one forked JVM, so
  // builder-time configs on getOrCreate are unreliable (static SQL
  // configs silently no-op when a session already exists) and any
  // modifiable conf we set leaks to other suites. So: use the shared
  // session, set the one conf we need via conf.set, and RESTORE it.
  lazy val spark = Sessions.local(4)

  test("bucketed orders ⋈ lineitem joins with no shuffle exchange") {
    val sf = "/root/testdata/sf0.001"
    // tiny SF would auto-broadcast and bypass the bucketed path we are
    // asserting (at fact scale broadcast is not an option)
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      runBucketedJoinAssertions(sf)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS lineitem_b")
    }
  }

  private def runBucketedJoinAssertions(sf: String): Unit = {
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
