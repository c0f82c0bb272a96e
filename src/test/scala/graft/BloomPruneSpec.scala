package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.BloomPrune

/** The bloom prefilter must change cost only — never the result. */
class BloomPruneSpec extends AnyFunSuite {
  lazy val spark = Sessions.local(4)
  import spark.implicits._

  test("bloom-pruned semi join equals the exact semi join") {
    val sf = "/root/testdata/sf0.001"
    val li = Tables.lineitem(spark, sf)
    val keys = Tables.orders(spark, sf)
      .filter(col("o_totalprice") > 300000.0).select(col("o_orderkey"))
    val pruned = BloomPrune.semiJoin(li, col("l_orderkey"), keys, "o_orderkey",
        expectedKeys = 5000L, fpp = 0.01)
      .select(col("l_orderkey"), col("l_linenumber"))
    val exact = li.join(keys, li("l_orderkey") === keys("o_orderkey"), "left_semi")
      .select(col("l_orderkey"), col("l_linenumber"))
    assert(pruned.exceptAll(exact).isEmpty && exact.exceptAll(pruned).isEmpty)
    assert(pruned.count() == exact.count() && pruned.count() > 0)
  }

  test("the prefilter really prunes: non-matching rows drop before the join") {
    // 1000 corpus keys, allowlist of 10 → at 1% fpp the bloom passes
    // ~10 matches + ~10 false positives, not 1000 rows.
    val big = (1L to 1000L).map(k => (k, s"row$k")).toDF("k", "payload")
    val keys = (1L to 10L).map(k => Tuple1(k * 100)).toDF("key")
    val bloom = keys.stat.bloomFilter("key", 10L, 0.01)
    val passed = (1L to 1000L).count(bloom.mightContainLong)
    assert(passed < 100, s"bloom passed $passed of 1000")
    val result = BloomPrune.semiJoin(big, col("k"), keys, "key", 10L, 0.01)
    assert(result.count() == 10L)
  }
}
