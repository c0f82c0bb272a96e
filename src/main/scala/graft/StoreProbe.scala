package graft

import org.apache.spark.sql.functions._

import graft.operators.{Dedup, TextFunctions}

/** Reproducible driver behind SCALE.md's signature-store pricing: on
  * one corpus dir it (1) builds the history signature store ONCE
  * (timed — the one-time backfill), then times (2) the daily verdict
  * reading the store (`incrementalDedupFromStore`) and (3) the same
  * verdict recomputing history signatures from text
  * (`incrementalDedup`), median of 3 each behind [[Bench.isolate]].
  * The gap between (2) and (3) is exactly what persisting signatures
  * buys per day; q134 can't show it because its gate rebuilds the
  * store every run to stay hermetic.
  *
  * `runMain graft.StoreProbe <dir> [<dir2> ...]`
  */
object StoreProbe {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: StoreProbe <dir> [<dir2> ...]")
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt)
    args.foreach { dir =>
      val docs = Tables.documents(spark, dir)
      val isBatch =
        pmod(TextFunctions.hash60(col("doc_id").cast("string")), lit(10L)) < 1
      val history = docs.filter(!isBatch)
      val batch = docs.filter(isBatch)
      val root = java.nio.file.Files.createTempDirectory("graft_storeprobe").toString

      def timed(f: () => Unit): Double = {
        Bench.isolate(spark)
        val t0 = System.nanoTime()
        f()
        (System.nanoTime() - t0) / 1e9
      }
      def median3(f: () => Unit): (Double, Seq[Double]) = {
        f() // warmup
        val ts = (1 to 3).map(_ => timed(f)).sorted
        (ts(1), ts)
      }

      val tBuild = timed(() => Dedup.writeSignatureStore(
        history, "doc_id", "text", k = 16, shingleN = 3, root, batchId = 1L))
      val (tStore, rs) = median3(() => {
        Dedup.incrementalDedupFromStore(Dedup.readSignatureStore(spark, root),
          batch, "doc_id", "text", k = 16, shingleN = 3, bands = 8,
          threshold = 0.5).count(); ()
      })
      val (tRecompute, rr) = median3(() => {
        Dedup.incrementalDedup(history, batch, "doc_id", "text",
          k = 16, shingleN = 3, bands = 8, threshold = 0.5).count(); ()
      })
      println(f"STOREPROBE $dir build_once=$tBuild%.3f s  " +
        f"verdict_from_store=$tStore%.3f s ${rs.map(t => f"$t%.3f").mkString("[", ",", "]")}  " +
        f"verdict_recompute=$tRecompute%.3f s ${rr.map(t => f"$t%.3f").mkString("[", ",", "]")}")
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(root))
    }
    spark.stop()
  }
}
