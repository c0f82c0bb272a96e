package graft

/** Round-15 GC attribution probe (the round-14 verdict's "gc budget
  * audit"): run each named gate in isolation and report its own GC
  * milliseconds and block-manager storage footprint, so suite-level
  * gc_ms growth can be attributed to specific gates rather than
  * guessed at. `runMain graft.GcProbe [query ...]` (defaults to the
  * five slowest round-14 gates).
  */
object GcProbe {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val names = if (args.nonEmpty) args.toSeq else Seq(
      "q199_token_index_erasure", "q200_token_index_streamed",
      "q204_token_index_int8", "q198_token_index_store",
      "q191_langid_erasure")
    def gcMs(): Long = {
      import scala.jdk.CollectionConverters._
      java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
        .asScala.map(_.getCollectionTime).sum
    }
    names.foreach { n =>
      SparkEntry.queries(n)(spark, sfDir).count() // warm
      Bench.isolate(spark)
      val (g0, t0) = (gcMs(), System.nanoTime())
      SparkEntry.queries(n)(spark, sfDir).count()
      val (g1, t1) = (gcMs(), System.nanoTime())
      val storage = spark.sparkContext.getRDDStorageInfo
      val pinnedMb = storage.map(_.memSize).sum / (1024 * 1024)
      println(f"GCPROBE $n wall=${(t1 - t0) / 1e9}%.3f gc_ms=${g1 - g0} " +
        s"leaked_pinned_blocks=${storage.length} pinned_mb=$pinnedMb")
    }
    println(s"GCPROBE total_gc_ms=${gcMs()}")
    spark.stop()
  }
}
