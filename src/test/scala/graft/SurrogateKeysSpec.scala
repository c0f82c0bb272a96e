package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.SurrogateKeys

/** The two [[SurrogateKeys.sequentialKeys]] paths — single-task (under
  * the broadcast threshold) and distributed two-phase — must assign
  * IDENTICAL keys: both realize `row_number() - 1` over the same total
  * order. The distributed path is forced by disabling the broadcast
  * threshold, the same knob that gates it in production.
  */
class SurrogateKeysSpec extends AnyFunSuite {
  lazy val spark = Sessions.local(4)

  private val sf = "/root/testdata/sf0.001"

  private def keysOf(): Map[Long, Long] =
    SurrogateKeys.sequentialKeys(
        Tables.customer(spark, sf).select(col("c_custkey"), col("c_name")),
        Seq(col("c_custkey")), "sk")
      .collect().map(r => r.getAs[Long]("c_custkey") -> r.getAs[Long]("sk")).toMap

  private def withDistributedPath[A](f: => A): A = {
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val old = spark.conf.get(key)
    spark.conf.set(key, "-1")
    try f finally spark.conf.set(key, old)
  }

  test("single-task and distributed re-key assign identical dense keys") {
    val small = keysOf()
    val dist = withDistributedPath(keysOf())
    assert(dist == small)
    // dense 0..N-1, ordered by the natural key
    assert(small.values.toSeq.sorted == (0L until small.size.toLong))
    assert(small.toSeq.sortBy(_._1).map(_._2) == small.toSeq.sortBy(_._2).map(_._2))
  }

  test("neither path plans a window operator (no single-partition funnel)") {
    def plan(): String = SurrogateKeys.sequentialKeys(
        Tables.customer(spark, sf).select(col("c_custkey"), col("c_name")),
        Seq(col("c_custkey")), "sk")
      .queryExecution.executedPlan.toString
    assert(!plan().contains("Window"), plan())
    withDistributedPath(assert(!plan().contains("Window"), plan()))
  }

  test("distributed re-key stays correct on nondeterministic upstream row order") {
    // a join scrambles intra-partition order between executions — the
    // materialization barrier inside sequentialKeys must pin ONE
    // partitioning before indexing (see the scaladoc); this guards the
    // regression where a two-branch lazy plan sampled range bounds
    // twice and emitted inconsistent offsets.
    withDistributedPath {
      val c = Tables.customer(spark, sf)
      val o = Tables.orders(spark, sf).groupBy(col("o_custkey"))
        .agg(count(lit(1)).as("n_orders"))
      val joined = c.join(o, col("c_custkey") === col("o_custkey"), "left")
        .select(col("c_custkey"), col("c_name"), col("n_orders"))
      val keyed = SurrogateKeys.sequentialKeys(joined, Seq(col("c_custkey")), "sk")
        .select(col("c_custkey"), col("sk"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
      val expected = keyed.map(_._1).sorted.zipWithIndex.map { case (k, i) => (k, i.toLong) }
      assert(keyed.toSeq == expected.toSeq)
    }
  }
}
