package graft

import org.apache.spark.sql.functions._

import graft.operators.{Checkpoints, LateInteraction}

/** Reproducible driver behind SCALE.md's pruned-serve table: pins the
  * round-14 claim "token-index serve input scales with CANDIDATES,
  * not store size" with measured serve times AND input records on the
  * same store read both ways — bucket-pruned (the `__pb` partition
  * filter from the candidates' hashed buckets) vs forced full scan
  * (`_buckets` meta removed — the legacy-flat fallback path). The
  * candidate set is FIXED (every eval query × 10 fixed passages), so
  * the only moving part between the two measurements is the scan.
  *
  * `runMain graft.TokenIndexPruneProbe [B=<buckets>] [CAND=<n>] <dir1>
  * [dir2 ...]` prints one `PRUNE <dir> B=<b> <label> <median>s [runs]
  * records=<n>` line per measurement. `B=` sets the store's bucket
  * count (default [[LateInteraction.DefaultBuckets]] = the gate-scale
  * 16; the round-14 verdict asks for the production shape B=64/256 on
  * a 10× store, where the saved scan exceeds the ~0.3 s fixed cost of
  * the two pruning jobs). `CAND=` sets the fixed candidate-passage
  * count per query (default 10).
  */
object TokenIndexPruneProbe {
  def main(args0: Array[String]): Unit = {
    val buckets = args0.collectFirst { case s if s.startsWith("B=") =>
      s.drop(2).toInt }.getOrElse(LateInteraction.DefaultBuckets)
    val nCand = args0.collectFirst { case s if s.startsWith("CAND=") =>
      s.drop(5).toInt }.getOrElse(10)
    val args = args0.filterNot(s => s.startsWith("B=") || s.startsWith("CAND="))
    require(args.nonEmpty,
      "usage: TokenIndexPruneProbe [B=<buckets>] [CAND=<n>] <dir1> [dir2 ...]")
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt)
    def rm(p0: String): Unit = {
      val p = new org.apache.hadoop.fs.Path(p0)
      p.getFileSystem(spark.sessionState.newHadoopConf()).delete(p, true)
    }
    args.foreach { dir =>
      // no checkpoints: Bench.isolate sweeps persistent blocks (the
      // ErasureScaleProbe rule); recomputation is constant across the
      // two compared serves
      val docs = Tables.documents(spark, dir)
      val root = java.nio.file.Files
        .createTempDirectory("graft_pruneprobe_ti").toString
      val chunks = graft.operators.Chunking
        .chunkByTokens(docs, "doc_id", "text", 64, 48)
        .select((col("doc_id") * lit(1048576L) + col("chunk_id"))
          .as("neighbor_id"), col("chunk_text").as("text"))
      LateInteraction.writeTokenIndex(chunks.filter(col("neighbor_id") % 2 === 0),
        "neighbor_id", "text", dim = 16, root, batchId = 1L, buckets = buckets)
      LateInteraction.writeTokenIndex(chunks.filter(col("neighbor_id") % 2 === 1),
        "neighbor_id", "text", dim = 16, root, batchId = 2L, buckets = buckets)
      val qs = docs.filter(col("doc_id") % 97 === 3)
        .select(col("doc_id").as("query_id"), col("text"))
      val cand = qs.select(col("query_id")).crossJoin(
        chunks.select(col("neighbor_id"))
          .orderBy(col("neighbor_id")).limit(nCand))
      def serve(): Unit = {
        val r = LateInteraction.maxSimFromTokenIndex(
          spark, root, cand, qs, "query_id", "neighbor_id", "text",
          dim = 16, maxQueryTokens = 16, k = 5)
        r.count()
        Checkpoints.releasePinned(r)
      }
      def measure(label: String): Unit = {
        def run(): (Double, Long) = {
          Bench.isolate(spark)
          val t0 = System.nanoTime()
          val (_, m) = Metrics.capture(spark)(serve())
          ((System.nanoTime() - t0) / 1e9, m.inputRecords)
        }
        run() // warmup
        val rs = (1 to 3).map(_ => run())
        val ts = rs.map(_._1).sorted
        println(f"PRUNE $dir B=$buckets $label ${ts(1)}%.3f s  " +
          ts.map(t => f"$t%.3f").mkString("[", ",", "]") +
          s" records=${rs.map(_._2).min}")
      }
      measure("serve_bucket_pruned")
      // force the legacy full-scan path: remove the layout meta
      val meta = new org.apache.hadoop.fs.Path(root, "_buckets")
      meta.getFileSystem(spark.sessionState.newHadoopConf())
        .delete(meta, false)
      measure("serve_full_scan")
      rm(root)
    }
    spark.stop()
  }
}
