package graft

/** Benchmark main: runs the headline queries on SPARK_GRAFT_SF_DIR and
  * prints ONE JSON line for the driver (`BENCH_r{N}.json`). */
object Bench {
  /** Representative spread: scans+aggs, joins, top-k, windows, SCD2,
    * plus the training-data ops (LSH dedup, SimHash, brute-force ANN). */
  val headline: Seq[String] = Seq(
    "q01_global_agg", "q02_groupby_agg", "q03_join_groupby",
    "q05_conditional_rates", "q09_top20_ltv", "q10_brand_profitability",
    "q20_scd2_incremental", "q22_sessionize",
    "q30_minhash_lsh", "q31_simhash", "q34_ann_brute_force")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4").toInt
    val spark = Sessions.local(cpus)
    val qs = headline.filter(SparkEntry.queries.contains)
    // Warm the JVM/codegen once on the smallest SF so measured times
    // reflect the engine, not first-call JIT + planner warmup.
    qs.foreach { n =>
      try SparkEntry.queries(n)(spark, "/root/testdata/sf0.001").count()
      catch { case _: Throwable => () } // failure surfaces in the timed run
    }
    val errors = scala.collection.mutable.LinkedHashMap.empty[String, String]
    val results = qs.map { name =>
      spark.catalog.clearCache() // isolate per-query timings
      val t0 = System.nanoTime()
      try {
        SparkEntry.queries(name)(spark, sfDir).count()
        name -> (System.nanoTime() - t0) / 1e9
      } catch {
        case e: Throwable =>
          errors += name -> e.getMessage.takeWhile(_ != '\n').take(200)
          name -> -1.0 // visible failure marker, not a bogus timing
      }
    }
    val qJson = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.collect { case (_, v) if v >= 0 => v }.sum
    def esc(s: String) = s.flatMap { case '"' => "\\\""; case '\\' => "\\\\"; case c if c < ' ' => " "; case c => c.toString }
    val errJson = errors.map { case (k, v) => "\"" + k + "\":\"" + esc(v) + "\"" }
      .mkString("{", ",", "}")
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qJson,"errors":$errJson,"sf":"$sfDir"}""")
    spark.stop()
  }
}
