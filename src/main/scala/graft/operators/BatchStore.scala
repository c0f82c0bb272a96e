package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Generic append-only batch store: the commit protocol behind
  * [[Dedup.writeSignatureStore]] (which predates this helper and
  * keeps its own copy), reusable for any frame a daily pipeline
  * appends deltas to — posting lists ([[InvertedIndex]]), feature
  * tables, document signatures. Layout is one parquet dir per
  * committed batch (`root/batch=<id>`); a batch is staged under a
  * dot-dir (invisible to readers — the parquet source skips dot
  * paths) and RENAMED in atomically, so:
  *  - a reader never sees a half-written batch;
  *  - a crashed write leaves only invisible `.staging-*` garbage
  *    ([[vacuumStaging]] is hygiene, not correctness);
  *  - a retry of a committed batch id fails fast instead of
  *    duplicating rows.
  * Readers scan the union of committed batches — history bytes are
  * written once, ever; the daily append writes ONLY the delta. */
object BatchStore {

  /** Stage `df` and commit it as `root/batch=<batchId>`. */
  def append(df: DataFrame, root: String, batchId: Long): Unit = {
    val spark = df.sparkSession
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val dest = new org.apache.hadoop.fs.Path(root, s"batch=$batchId")
    require(!fs.exists(dest), s"batch $batchId already committed at $dest")
    val tmp = new org.apache.hadoop.fs.Path(root,
      s".staging-$batchId-${java.util.UUID.randomUUID().toString.take(8)}")
    df.write.mode("error").parquet(tmp.toString)
    require(fs.rename(tmp, dest), s"commit rename $tmp -> $dest failed")
  }

  /** All committed batches as one frame; the `batch` partition column
    * rides along for auditing. */
  def read(spark: SparkSession, root: String): DataFrame =
    spark.read.parquet(root)

  /** Delete leftover `.staging-*` dirs from crashed [[append]]s.
    * Never touches committed batches; only run when no concurrent
    * writer is staging. Returns the number of dirs removed. */
  def vacuumStaging(spark: SparkSession, root: String): Int = {
    val p = new org.apache.hadoop.fs.Path(root)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(p)) 0
    else fs.listStatus(p).count { st =>
      val stale = st.isDirectory && st.getPath.getName.startsWith(".staging-")
      if (stale) fs.delete(st.getPath, true)
      stale
    }
  }
}
