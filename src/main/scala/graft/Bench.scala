package graft

/** Benchmark main: runs the headline queries on SPARK_GRAFT_SF_DIR and
  * prints ONE JSON line for the driver (`BENCH_r{N}.json`). Each query
  * reports the median of three timed runs, so one GC pause or
  * stage-scheduling hiccup can't masquerade as a round-over-round
  * regression. */
object Bench {
  /** Representative spread: scans+aggs, joins, top-k, windows, SCD2,
    * the training-data ops (LSH dedup, SimHash, ANN brute + bucketed),
    * as-of association, and the ranking suite. */
  val headline: Seq[String] = Seq(
    "q01_global_agg", "q02_groupby_agg", "q03_join_groupby",
    "q05_conditional_rates", "q09_top20_ltv", "q10_brand_profitability",
    "q20_scd2_incremental", "q22_sessionize",
    "q29_dedup_exact", "q30_minhash_lsh", "q31_simhash",
    "q34_ann_brute_force", "q35_ann_bucketed", "q43_asof_attribution",
    "q44_rank_suite", "q51_ivf_assign", "q52_ivf_multiprobe")

  private val runsPerQuery = 3

  private def median(xs: Seq[Double]): Double = {
    val s = xs.sorted
    s(s.length / 2)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4").toInt
    val spark = Sessions.local(cpus)
    val qs = headline.filter(SparkEntry.queries.contains)
    // Warm the JVM/codegen against the benchmarked directory (one
    // untimed pass) so measured times reflect the engine, not
    // first-call JIT + planner warmup. A warmup failure is logged, not
    // swallowed — it would otherwise skew only the first timed run and
    // mask a warmup-only regression.
    qs.foreach { n =>
      try SparkEntry.queries(n)(spark, sfDir).count()
      catch { case e: Throwable =>
        System.err.println(s"[bench] warmup $n failed: ${e.getMessage}")
      }
    }
    val errors = scala.collection.mutable.LinkedHashMap.empty[String, String]
    val results = qs.map { name =>
      val times = (1 to runsPerQuery).flatMap { _ =>
        spark.catalog.clearCache() // isolate per-query timings
        val t0 = System.nanoTime()
        try {
          SparkEntry.queries(name)(spark, sfDir).count()
          Some((System.nanoTime() - t0) / 1e9)
        } catch {
          case e: Throwable =>
            errors += name -> e.getMessage.takeWhile(_ != '\n').take(200)
            None
        }
      }
      // All-or-nothing: a query that failed ANY of its runs reports the
      // -1 failure marker (plus its errors entry), never a timing — a
      // partial median over 2 runs is s(1) = the max, and a row in both
      // queries{} and errors{} would be ambiguous to the driver.
      if (times.length < runsPerQuery) name -> -1.0
      else name -> median(times)
    }
    val qJson = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.collect { case (_, v) if v >= 0 => v }.sum
    def esc(s: String) = s.flatMap { case '"' => "\\\""; case '\\' => "\\\\"; case c if c < ' ' => " "; case c => c.toString }
    val errJson = errors.map { case (k, v) => "\"" + k + "\":\"" + esc(v) + "\"" }
      .mkString("{", ",", "}")
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qJson,"errors":$errJson,"runs_per_query":$runsPerQuery,"stat":"median","sf":"$sfDir"}""")
    spark.stop()
  }
}
