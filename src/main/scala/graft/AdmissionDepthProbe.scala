package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators._

/** SCALE probe for the STREAMED NEAR-DUP ADMISSION loop's history
  * depth (q238's per-epoch body, [[Dedup.nearDupAdmitSlice]]): the
  * [[CurationDepthProbe]] discipline on the MinHash store — fixed
  * 500-doc slice, admitted-signature history grown 1×/10×/50× —
  * except the history rows here are full signatures (digest + shingle
  * set + k minhashes), so the near pass's store scan is the term
  * under test, not just the exact digests.
  *
  * Claim under test: with the per-batch Bloom sidecars
  * ([[Dedup.writeSignatureStoreBanded]]) the per-epoch serve scans
  * only the history batches the slice can actually collide with —
  * wall, shuffle bytes AND input records stay ~flat as the admitted
  * history deepens (the slice's dups live in one seed batch by
  * construction, the realistic re-crawl shape). Before round 17 the
  * exact+near+verify passes each re-scanned the whole store per
  * epoch: input records grew linearly with corpus age.
  *
  * usage: AdmissionDepthProbe [depths, default 1,10,50]
  */
object AdmissionDepthProbe {

  /** 12-token docs, unique per (series, i) — shingle-rich so the near
    * pass has real MinHash work. */
  private def synth(spark: SparkSession, series: Long, lo: Long,
      n: Long): DataFrame =
    spark.range(lo, lo + n).select(
      col("id").as("doc_id"),
      concat_ws(" ", (0 until 12).map(t =>
        concat(lit(s"s${series}w"), col("id"), lit(s"t$t"))): _*)
        .as("text"))

  def main(args: Array[String]): Unit = {
    val depths = (if (args.nonEmpty) args(0) else "1,10,50")
      .split(",").toSeq.map(_.trim.toInt)
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt)
    val baseBatch = 2000L
    val sliceN = 500L
    val (k, shingleN, bands, threshold) = (8, 3, 4, 0.5)

    depths.foreach { d =>
      val base = java.nio.file.Files
        .createTempDirectory(s"graft_admdepth_$d").toString
      def p(n: String) = new org.apache.hadoop.fs.Path(base, n).toString
      val (sigRoot, keptRoot) = (p("sig"), p("kept"))
      try {
        // D admitted-history batches of unique content; batch 1 is the
        // SEED the slices re-crawl (the realistic dup source)
        (1 to d).foreach { b =>
          Dedup.writeSignatureStoreBanded(
            synth(spark, b.toLong, b * 1000000L, baseBatch),
            "doc_id", "text", k, shingleN, bands, sigRoot, b.toLong)
        }
        def epoch(i: Long): (Double, Metrics.JobMetrics) = {
          // 400 fresh docs + 100 re-crawls of seed-batch content
          // (fresh ids, identical text → exact dups of batch 1)
          val slice = synth(spark, 900L + i, 900000000L + i * 10000L, 400L)
            .unionByName(
              synth(spark, 1L, 1000000L + i * 100L, 100L)
                .select((col("doc_id") + 800000000L).as("doc_id"),
                  col("text")))
            .localCheckpoint()
          val t0 = System.nanoTime()
          val (_, m) = Metrics.capture(spark) {
            Dedup.nearDupAdmitSlice(spark, slice, "doc_id", "text",
              k, shingleN, bands, threshold, sigRoot, keptRoot,
              batchId = 2000L + i)
          }
          Checkpoints.releasePinned(slice)
          ((System.nanoTime() - t0) / 1e9, m)
        }
        epoch(0L) // warm epoch: JIT + first-listing costs
        val runs = (1L to 3L).map(epoch)
        val med = runs.map(_._1).sorted.apply(1)
        val m = runs(1)._2
        println(f"ADMDEPTH depth=$d epoch_s=$med%.3f " +
          f"shuffleMB=${m.shuffleWriteBytes / 1e6}%.2f " +
          s"inputRecords=${m.inputRecords}")
      } finally {
        val pp = new org.apache.hadoop.fs.Path(base)
        pp.getFileSystem(spark.sessionState.newHadoopConf())
          .delete(pp, true)
      }
    }
    spark.stop()
  }
}
