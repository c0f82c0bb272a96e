package graft

/** Reproducible driver behind SCALE.md's round-15 rows: medians of 3
  * isolated runs of the perceptual-image-dedup gates (q218/q219) and
  * the cross-store erasure composition (q220) per testdata dir.
  *
  * `runMain graft.ImageErasureScaleProbe <dir1> [dir2 ...]` prints one
  * `PROBE <dir> <query> median=<s> rows=<n>` line per measurement.
  */
object ImageErasureScaleProbe {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: ImageErasureScaleProbe <dir1> [dir2 ...]")
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt)
    args.foreach { dir =>
      Seq("q218_image_dhash", "q219_image_near_dup",
          "q220_forget_everywhere", "q221_curation_streamed",
          "q222_image_hash_store", "q223_curation_restarted").foreach { q =>
        SparkEntry.queries(q)(spark, dir).count() // warm
        val ts = (1 to 3).map { _ =>
          Bench.isolate(spark)
          val t0 = System.nanoTime()
          val n = SparkEntry.queries(q)(spark, dir).count()
          ((System.nanoTime() - t0) / 1e9, n)
        }
        println(f"PROBE $dir $q median=${ts.map(_._1).sorted.apply(1)}%.3f " +
          s"rows=${ts.head._2}")
      }
    }
    spark.stop()
  }
}
