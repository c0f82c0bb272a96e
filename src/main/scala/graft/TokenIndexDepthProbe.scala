package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators._

/** SCALE probe for the TOKEN-INDEX serve's history depth (the
  * round-17 verdict's #6): fixed 20-candidate re-rank, store grown
  * 1×/10×/50× batches — measured BOTH ways on the same store, with
  * the per-batch passage-id Bloom sidecars (round 18,
  * `prunedStoreRead`'s batch-level prune) and with `_bloom` deleted
  * (the pre-round-18 era: bucket pruning only).
  *
  * Claim under test: each passage lives wholly in one batch, so a
  * serve for K candidates touches at most K batches through the
  * sidecars — input records stay ~FLAT as history deepens, where
  * bucket pruning alone reads the candidates' buckets of EVERY batch
  * (input ∝ history/buckets — linear in depth at fixed bucket
  * count).
  *
  * usage: TokenIndexDepthProbe [depths, default 1,10,50]
  */
object TokenIndexDepthProbe {

  private def passages(spark: SparkSession, batch: Long,
      n: Long): DataFrame =
    spark.range(batch * 1000000L, batch * 1000000L + n).select(
      col("id").as("neighbor_id"),
      concat_ws(" ",
        concat(lit("tok"), col("id")),
        concat(lit("alpha"), col("id") % 97),
        concat(lit("beta"), col("id") % 89),
        concat(lit("gamma"), col("id") % 83)).as("text"))

  def main(args: Array[String]): Unit = {
    val depths = (if (args.nonEmpty) args(0) else "1,10,50")
      .split(",").toSeq.map(_.trim.toInt)
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt)
    val perBatch = 2000L
    val dim = 16

    depths.foreach { d =>
      val root = java.nio.file.Files
        .createTempDirectory(s"graft_tidepth_$d").toString
      try {
        (1 to d).foreach(b => LateInteraction.writeTokenIndex(
          passages(spark, b.toLong, perBatch), "neighbor_id", "text",
          dim, root, b.toLong))
        // fixed serve: 4 queries × 5 batch-1 candidates each — the
        // re-rank shape, candidates all in one batch (a day's
        // retrieval hits re-ranked against their own index batch)
        val queries = spark.range(4).select(col("id").as("query_id"),
          concat_ws(" ", concat(lit("tok"), lit(1000000L) + col("id")),
            concat(lit("alpha"), (lit(1000000L) + col("id")) % 97))
            .as("text"))
        val cands = queries.select(col("query_id"))
          .crossJoin(spark.range(5).select(
            (lit(1000000L) + col("id") * 7L).as("neighbor_id")))
          .localCheckpoint()
        def serve(): (Double, Metrics.JobMetrics) = {
          val t0 = System.nanoTime()
          val (_, m) = Metrics.capture(spark) {
            val r = LateInteraction.maxSimFromTokenIndex(spark, root,
              cands, queries, "query_id", "neighbor_id", "text", dim,
              maxQueryTokens = 8, k = 5)
            r.count()
            Checkpoints.releasePinned(r)
          }
          ((System.nanoTime() - t0) / 1e9, m)
        }
        def measure(mode: String): Unit = {
          serve() // warm: JIT + listing
          val runs = (1 to 3).map(_ => serve())
          val med = runs.map(_._1).sorted.apply(1)
          println(f"TIDEPTH depth=$d mode=$mode serve_s=$med%.3f " +
            s"inputRecords=${runs(1)._2.inputRecords}")
        }
        measure("pruned")
        val bloomDir = new org.apache.hadoop.fs.Path(root, "_bloom")
        bloomDir.getFileSystem(spark.sessionState.newHadoopConf())
          .delete(bloomDir, true)
        measure("flat")
        Checkpoints.releasePinned(cands)
      } finally {
        val pp = new org.apache.hadoop.fs.Path(root)
        pp.getFileSystem(spark.sessionState.newHadoopConf())
          .delete(pp, true)
      }
    }
    spark.stop()
  }
}
