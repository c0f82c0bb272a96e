package graft
object Q165Probe {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    Seq("q165_hard_negatives", "q150_pq_trained_planted", "q167_retrieval_mrr").foreach { n =>
      SparkEntry.queries(n)(spark, sfDir).count() // warm
      val ts = (1 to 5).map { _ =>
        Bench.isolate(spark)
        val t0 = System.nanoTime()
        SparkEntry.queries(n)(spark, sfDir).count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"Q165PROBE $n median=${ts.sorted.apply(2)}%.3f " + ts.map(t => f"$t%.3f").mkString("[", ",", "]"))
    }
    spark.stop()
  }
}
