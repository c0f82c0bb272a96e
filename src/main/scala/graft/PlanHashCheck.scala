package graft

/** Dev tool (round 18): print `name<TAB>PlanFingerprint.hash` for the
  * given queries — run twice (two JVMs) and diff to check cross-JVM
  * determinism of the normalized plan fingerprint.
  *
  * usage: runMain graft.PlanHashCheck <sfDir> <query> [...]
  */
object PlanHashCheck {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args.drop(1).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt
    val spark = Sessions.local(cpus)
    names.zipWithIndex.foreach { case (n, i) =>
      val df = SparkEntry.queries(n)(spark, sfDir)
      println(s"PLANHASH\t$n\t${PlanFingerprint.hash(df)}")
      sys.env.get("GRAFT_PLANDUMP_DIR").foreach { d =>
        new java.io.File(d).mkdirs()
        val w = new java.io.PrintWriter(s"$d/${i}_$n.txt", "UTF-8")
        try w.println(PlanFingerprint.normalize(
          df.queryExecution.explainString(
            org.apache.spark.sql.execution.SimpleMode)))
        finally w.close()
      }
    }
    spark.stop()
  }
}
