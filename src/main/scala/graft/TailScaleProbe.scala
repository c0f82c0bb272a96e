package graft

/** Reproducible driver behind SCALE.md's scale-shape tables: times a
  * comma-listed subset of [[SparkEntry.queries]] against each
  * directory argument — one untimed warmup per (query, dir), then
  * median of 3 timed runs, each started after [[Bench.isolate]]'s
  * blocking block-release + GC (the same discipline the bench uses,
  * so these numbers are comparable to BENCH artifacts).
  *
  * `runMain graft.TailScaleProbe <q1,q2,...> <dir1> [dir2 ...]`
  * prints one `SCALE <dir> <query> <median>s [runs]` line per pair.
  */
object TailScaleProbe {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: TailScaleProbe <q1,q2,...> <dir1> [dir2 ...]")
    val names = args(0).split(",").toSeq
    val dirs = args.drop(1).toSeq
    val unknown = names.filterNot(SparkEntry.queries.contains)
    require(unknown.isEmpty, s"unknown queries: ${unknown.mkString(",")}")
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt)
    dirs.foreach { dir =>
      names.foreach { n =>
        def run(): Double = {
          Bench.isolate(spark)
          val t0 = System.nanoTime()
          SparkEntry.queries(n)(spark, dir).count()
          (System.nanoTime() - t0) / 1e9
        }
        run() // warmup: JIT + planner, untimed
        val times = (1 to 3).map(_ => run()).sorted
        println(f"SCALE $dir $n ${times(1)}%.3f s  " +
          times.map(t => f"$t%.3f").mkString("[", ",", "]"))
      }
    }
    spark.stop()
  }
}
