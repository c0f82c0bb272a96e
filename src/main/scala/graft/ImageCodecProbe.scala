package graft

import org.apache.spark.sql.functions._

/** Probe for the q111 image-decode path: times the full PNG
  * encode+decode workload ([[graft.operators.Multimodal.imageStats]]
  * over per-doc PNG fixtures, q111's exact body) at a given sf dir.
  *
  * Exists to document the round-12 q111 regression (0.89 s → 1.85 s
  * on untouched code): ImageIO's DEFAULT stream cache is disk-backed
  * — every `ImageIO.read(InputStream)` / `write(img, fmt,
  * OutputStream)` creates a temp FILE, so each of the 5000 images at
  * sf0.1 paid executor-local disk I/O, and the box's /tmp got slower
  * between rounds. Measured standalone (JDK 17.0.20, this container):
  * 5000 encode+decode = 2717 ms with the disk cache, 1115 ms with
  * `ImageIO.setUseCache(false)` — the flag Multimodal now sets in its
  * object initializer.
  *
  * Usage: `runMain graft.ImageCodecProbe <sfDir> [runs]` — prints
  * `IMGPROBE <dir> median s [runs...]`.
  */
object ImageCodecProbe {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: ImageCodecProbe <sfDir> [runs]")
    val dir = args(0)
    val nRuns = if (args.length > 1) args(1).toInt else 5
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt)
    import spark.implicits._
    import graft.operators.Multimodal
    def body(): Long = {
      val ids = Tables.documents(spark, dir).select(col("doc_id").as("id"))
      val media = ids.as[Long].map { id =>
        if (id % 7 == 0)
          Multimodal.MediaRecord(id, "image", s"img-$id".getBytes("UTF-8"))
        else Multimodal.MediaRecord(id, "image", Multimodal.pngBytes(
          w = (8 + id % 5 * 4).toInt, h = (6 + id % 3 * 4).toInt, seed = id))
      }.toDF()
      Multimodal.imageStats(spark, media).count()
    }
    body() // warmup: JIT + codegen
    val ts = (1 to nRuns).map { _ =>
      Bench.isolate(spark)
      val t0 = System.nanoTime(); body(); (System.nanoTime() - t0) / 1e9
    }.sorted
    println(f"IMGPROBE $dir ${ts(nRuns / 2)}%.3f s  " +
      ts.map(t => f"$t%.3f").mkString("[", ",", "]"))
    spark.stop()
  }
}
