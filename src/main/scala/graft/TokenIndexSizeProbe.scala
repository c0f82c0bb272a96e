package graft

import org.apache.spark.sql.functions._

/** SCALE.md driver for the q204 storage claim: writes the SAME
  * chunked corpus into the float64 token index
  * ([[graft.operators.LateInteraction.writeTokenIndex]]) and the
  * int8-packed one ([[LateInteraction.writeTokenIndexInt8]]), then
  * prints the committed bytes of each —
  * `TISIZE <dir> float64=<bytes> int8=<bytes> ratio=<r>`.
  * The float path persists `array<double>` vectors + a double norm
  * (8 bytes/component before parquet encoding); the int8 path one
  * byte/component as BINARY. Parquet encoding (RLE, dictionaries)
  * moves both, so the claim is pinned by MEASURED bytes, not
  * arithmetic.
  *
  * `runMain graft.TokenIndexSizeProbe <dir1> [dir2 ...]`
  */
object TokenIndexSizeProbe {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: TokenIndexSizeProbe <dir1> [dir2 ...]")
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt)
    import graft.operators.{Chunking, LateInteraction}
    args.foreach { dir =>
      val docs = Tables.documents(spark, dir)
      val passages = Chunking.chunkByTokens(docs, "doc_id", "text", 64, 48)
        .select((col("doc_id") * lit(1048576L) + col("chunk_id"))
          .as("neighbor_id"), col("chunk_text").as("text"))
      def bytesOf(root: String): Long = {
        val p = new org.apache.hadoop.fs.Path(root)
        p.getFileSystem(spark.sessionState.newHadoopConf())
          .getContentSummary(p).getLength
      }
      def rm(root: String): Unit = {
        val p = new org.apache.hadoop.fs.Path(root)
        p.getFileSystem(spark.sessionState.newHadoopConf()).delete(p, true)
      }
      val f64 = java.nio.file.Files.createTempDirectory("graft_tisize_f64").toString
      val i8 = java.nio.file.Files.createTempDirectory("graft_tisize_i8").toString
      LateInteraction.writeTokenIndex(passages, "neighbor_id", "text",
        dim = 16, f64, batchId = 1L)
      LateInteraction.writeTokenIndexInt8(passages, "neighbor_id", "text",
        dim = 16, i8, batchId = 1L)
      val (bf, bi) = (bytesOf(f64), bytesOf(i8))
      println(f"TISIZE $dir float64=$bf int8=$bi ratio=${bf.toDouble / bi}%.2f")
      rm(f64); rm(i8)
    }
    spark.stop()
  }
}
