package graft

import org.apache.spark.scheduler._
import scala.collection.mutable

/** Dev tool (round 18): per-JOB cost profile of one registered query.
  *
  * The bench tells us a composite gate costs N seconds; this tells us
  * WHERE — each Spark job's wall ms, its call site (the operator line
  * that triggered the action), task counts and shuffle/input volumes,
  * printed in submission order plus a by-callsite rollup. Composite
  * gates (curation DAG, erasure registry, token-index lifecycle) run
  * dozens of sequential actions; optimization needs to know which of
  * them own the wall clock before touching any of them
  * (spark_optimization_guide §1: measure first).
  *
  * usage: runMain graft.JobProfile <sfDir> <queryName> [repeat]
  */
object JobProfile {
  private case class J(id: Int, desc: String, site: String, start: Long) {
    var end: Long = 0L
    var tasks: Int = 0
    var taskMs: Long = 0L
    var shufR: Long = 0L
    var shufW: Long = 0L
    var inBytes: Long = 0L
    var inRecs: Long = 0L
  }

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val name = args(1)
    val repeat = if (args.length > 2) args(2).toInt else 1
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = Sessions.local(cpus)

    val jobs = mutable.LinkedHashMap[Int, J]()
    val stageToJob = mutable.HashMap[Int, Int]()
    val listener = new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit =
        jobs.synchronized {
          val p = Option(e.properties)
          val desc = p.flatMap(q =>
            Option(q.getProperty("spark.job.description"))).getOrElse("")
          val site = p.flatMap(q =>
            Option(q.getProperty("callSite.short"))).getOrElse("")
          jobs(e.jobId) = J(e.jobId, desc, site, e.time)
          e.stageIds.foreach(s => stageToJob(s) = e.jobId)
        }
      override def onJobEnd(e: SparkListenerJobEnd): Unit =
        jobs.synchronized { jobs.get(e.jobId).foreach(_.end = e.time) }
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit =
        jobs.synchronized {
          stageToJob.get(e.stageId).flatMap(jobs.get).foreach { j =>
            j.tasks += 1
            val m = e.taskMetrics
            if (m != null) {
              j.taskMs += m.executorRunTime
              j.shufR += m.shuffleReadMetrics.totalBytesRead
              j.shufW += m.shuffleWriteMetrics.bytesWritten
              j.inBytes += m.inputMetrics.bytesRead
              j.inRecs += m.inputMetrics.recordsRead
            }
          }
        }
    }

    // untimed warmup pass (JIT + codegen + planner caches), then the
    // profiled pass(es)
    SparkEntry.queries(name)(spark, sfDir).count()
    (1 to repeat).foreach { r =>
      jobs.synchronized { jobs.clear(); stageToJob.clear() }
      spark.sparkContext.addSparkListener(listener)
      val t0 = System.nanoTime()
      val n = SparkEntry.queries(name)(spark, sfDir).count()
      val wall = (System.nanoTime() - t0) / 1e9
      spark.sparkContext.removeSparkListener(listener)
      // listener bus is async; let the tail drain before reading
      Thread.sleep(500)
      val js = jobs.synchronized { jobs.values.toSeq.sortBy(_.start) }
      val sumMs = js.map(j => math.max(0L, j.end - j.start)).sum
      println(f"===== JOBPROFILE $name pass $r: $n rows, wall $wall%.2f s, " +
        f"${js.size} jobs, job-sum ${sumMs / 1000.0}%.2f s =====")
      def clean(s: String) = s.replaceAll("\\s+", " ").trim
      println("  ms | tasks | taskms |  shufR |  shufW |  inMB | inRecs | site | desc")
      js.foreach { j =>
        val dur = math.max(0L, j.end - j.start)
        if (dur >= 20)
          println(f"$dur%6d | ${j.tasks}%5d | ${j.taskMs}%6d | ${j.shufR}%6d | ${j.shufW}%6d | ${j.inBytes / 1e6}%5.1f | ${j.inRecs}%6d | ${clean(j.site).take(44)}%-44s | ${clean(j.desc).take(70)}")
      }
      println("----- by description/callsite -----")
      js.groupBy(j => if (j.desc.nonEmpty) clean(j.desc).take(70)
          else clean(j.site).take(70)).toSeq
        .map { case (s, g) =>
          (s, g.map(j => math.max(0L, j.end - j.start)).sum, g.size) }
        .sortBy(-_._2).take(30)
        .foreach { case (s, ms, n2) =>
          println(f"$ms%7d ms  x$n2%-4d $s") }
    }
    spark.stop()
  }
}
