package graft

/** Dev tool (round 18): write each query's `.explain("formatted")`
  * output to a file — the committed before/after plan evidence for
  * the optimization rounds (`plans/r18/<query>_<suffix>.txt`).
  *
  * usage: runMain graft.PlanDump <sfDir> <outDir> <suffix> <query> [...]
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = new java.io.File(args(1))
    val suffix = args(2)
    val names = args.drop(3).toSeq
    outDir.mkdirs()
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt
    val spark = Sessions.local(cpus)
    names.foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      val f = new java.io.File(outDir, s"${name}_$suffix.txt")
      val w = new java.io.PrintWriter(f, "UTF-8")
      try w.println(plan) finally w.close()
      println(s"[plandump] wrote $f (${plan.length} chars)")
    }
    spark.stop()
  }
}
