package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators._

/** SCALE probe for the streamed curation DAG's HISTORY DEPTH
  * dimension: every earlier SCALE row grew the *slice*; this grows
  * the *stores behind a fixed slice* — the dimension the per-epoch
  * cost model lives on. For each depth D the signature + line-df
  * stores hold D× base batches of accumulated history; the probe then
  * measures a fixed-size epoch (`processSlice`) and prints wall
  * seconds + shuffle bytes + input records, with the cross-epoch
  * [[ModelCache]] on (the DAG configuration; epoch 1 pays the model
  * re-aggregates, epochs 2+ are the steady state) and off (the
  * pre-cache per-epoch constant, task-5 before/after).
  *
  * Claim under test: per-epoch wall time and shuffle bytes stay ~flat
  * as history grows — the dedup stage streams the store map-side
  * against the broadcast batch digests (nothing history-sized
  * shuffles), and the model serves are cached (nothing store-sized
  * re-aggregates per epoch).
  *
  * usage: CurationDepthProbe [depths, default 1,10,50]
  */
object CurationDepthProbe {

  private def synth(spark: SparkSession, lo: Long, n: Long,
      domains: Int): DataFrame =
    spark.range(lo, lo + n).select(
      col("id").as("doc_id"),
      concat(lit("d"), pmod(col("id"), lit(domains.toLong))).as("source"),
      concat(lit("nav menu line\nbody "), col("id"),
        lit(" alpha beta gamma tok"), col("id"),
        lit("\nfooter line")).as("text"))

  def main(args: Array[String]): Unit = {
    val depths = (if (args.nonEmpty) args(0) else "1,10,50")
      .split(",").toSeq.map(_.trim.toInt)
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt)
    val baseBatch = 2000L
    val sliceN = 500L

    depths.foreach { d =>
      Seq(true, false).foreach { useCache =>
        val base = java.nio.file.Files
          .createTempDirectory(s"graft_curdepth_$d").toString
        def p(n: String) = new org.apache.hadoop.fs.Path(base, n).toString
        try {
          val st = CurationPipeline.Stores(p("ldf"), p("qual"), p("lm"),
            p("sig"), p("kept"))
          // fixed pre-trained models (depth-independent sample)
          val sample = synth(spark, 0L, baseBatch, 64)
          QualityClassifier.writeQualityStore(
            sample.withColumn("label", lit("good")), "label", "text",
            buckets = 256, root = st.quality, batchId = 1L)
          LanguageModel.writeLmStore(sample, "doc_id", "text", st.lm, 1L)
          // D accumulated history batches in the signature AND line-df
          // stores (unique content, the 64 shared crawl domains)
          (1 to d).foreach { b =>
            val hist = synth(spark, b * 1000000L, baseBatch, 64)
            Dedup.writeSignatureStore(hist, "doc_id", "text", k = 4,
              shingleN = 3, root = st.signatures, batchId = b.toLong)
            Boilerplate.writeLineDfStore(hist, "doc_id", "source", "text",
              st.lineDf, batchId = b.toLong)
          }
          val gates = CurationPipeline.Gates(minDf = 100000L,
            buckets = 256, keepLabel = "good", lmCutAvgFp = 0.0,
            mixKeep = lit(true))
          val models = if (useCache) Some(new ModelCache) else None
          def epoch(i: Long): (Double, Metrics.JobMetrics) = {
            val slice = synth(spark, 900000000L + i * 10000L, sliceN, 64)
            val t0 = System.nanoTime()
            val (_, m) = Metrics.capture(spark) {
              CurationPipeline.processSlice(spark, st, gates, slice,
                "doc_id", "source", "text", batchId = 1000L + i, models)
            }
            ((System.nanoTime() - t0) / 1e9, m)
          }
          epoch(0L) // warm epoch: JIT + (when cached) the model builds
          val runs = (1L to 3L).map(epoch)
          val med = runs.map(_._1).sorted.apply(1)
          val m = runs(1)._2
          println(f"CURDEPTH depth=$d cached=$useCache epoch_s=$med%.3f " +
            f"shuffleMB=${m.shuffleWriteBytes / 1e6}%.2f " +
            s"inputRecords=${m.inputRecords}")
          models.foreach(_.releaseAll())
        } finally {
          val pp = new org.apache.hadoop.fs.Path(base)
          pp.getFileSystem(spark.sessionState.newHadoopConf())
            .delete(pp, true)
        }
      }
    }
    spark.stop()
  }
}
