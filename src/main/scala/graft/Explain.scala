package graft

/** Dev tool: print timing + the formatted physical plan of registered
  * queries. Used to review every query for parquet pushdown, broadcast
  * choices, and whole-stage-codegen coverage.
  *
  * Usage: runMain graft.Explain <sfDir> [queryName ...]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val names = if (args.length > 1) args.drop(1).toSeq
      else SparkEntry.registry.map(_.name)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt
    val spark = Sessions.local(cpus)
    names.foreach { name =>
      // time construction + count: operators that checkpoint eagerly
      // during construction (SCD2, q63's flag frames) do real work
      // before the first action — excluding it would under-report them
      val t0 = System.nanoTime()
      val df = SparkEntry.queries(name)(spark, sfDir)
      val n = df.count()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"===== $name: $n rows in $sec%.2f s =====")
      if (sys.env.get("GRAFT_EXPLAIN").contains("1")) df.explain("formatted")
    }
    spark.stop()
  }
}
