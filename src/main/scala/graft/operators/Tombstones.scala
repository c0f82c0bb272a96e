package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The ERASURE discipline shared by every served [[BatchStore]] index
  * (postings, PQ/IVF-PQ codes, signatures): a delete commits only the
  * removed ids as a tombstone batch under `root/.tombstones` (same
  * stage-and-rename protocol — a dot-dir, invisible to the store's
  * readers), every serve [[apply]]s the mask, and a maintenance
  * window's [[purge]] rewrites the store without the masked rows and
  * retires the applied tombstones. Deletes are visible to the next
  * query without rewriting a 100 TB store; masking cost is
  * proportional to accumulated deletes, never to the store.
  *
  * Store-specific bookkeeping stays with the store: the posting
  * store's negative stats row ([[InvertedIndex.deleteFromPostingStore]])
  * rides NEXT TO the shared tombstone commit, it does not change the
  * mask or purge.
  */
object Tombstones {

  def tombstoneRoot(root: String): String =
    new org.apache.hadoop.fs.Path(root, ".tombstones").toString

  /** Commit `ids` (a 1-column frame named `idCol`) as a tombstone
    * batch. Delete each id at most once across batches — the
    * append-delta discipline; a reused batchId fails fast. */
  def append(ids: DataFrame, idCol: String, root: String,
      batchId: Long): Unit =
    BatchStore.append(ids.select(col(idCol)), tombstoneRoot(root), batchId)

  /** Anti-join `rows` against the store's tombstones, if any. Apply
    * AFTER the serve's own pruning (term filter, partition filter) so
    * the join's left side is query-sized; the tombstone side is
    * delete-volume-sized (no hint — AQE picks broadcast when it
    * fits, a mass-erasure day must not be forced into one). */
  def apply(spark: SparkSession, root: String, rows: DataFrame,
      idCol: String): DataFrame = {
    val b = batches(spark, root)
    if (b.isEmpty) rows
    else rows.join(spark.read.parquet(b: _*).select(col(idCol)),
      Seq(idCol), "left_anti")
  }

  /** Committed tombstone batch dirs — empty-safe (a purge may leave,
    * or race-keep, the parent dir; an empty load path fails schema
    * inference). */
  def batches(spark: SparkSession, root: String): Seq[String] = {
    val tr = new org.apache.hadoop.fs.Path(tombstoneRoot(root))
    val fs = tr.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(tr)) Seq.empty
    else fs.listStatus(tr).toSeq
      .filter(st => st.isDirectory && st.getPath.getName.startsWith("batch="))
      .map(_.getPath.toString)
  }

  /** Physically drop tombstoned rows and retire the APPLIED
    * tombstones ([[BatchStore.compactWith]]: merge every batch,
    * anti-join the tombstones observed at start, commit as one batch
    * — re-partitioned by `partitionBy` when the store's layout needs
    * preserving, e.g. the IVF-PQ index's list dirs — delete the
    * originals). Only tombstone batches observed at start are
    * retired, so a delete RACING the purge keeps its tombstone and
    * stays masked on read; a racing APPEND aborts via the compact id
    * re-list. Returns the number of store batch dirs replaced, 0 if
    * there were no tombstones. */
  def purge(spark: SparkSession, root: String, idCol: String,
      newBatchId: Long, partitionBy: Seq[String] = Seq.empty,
      onBeforeCommit: () => Unit = () => ()): Int = {
    val tr = new org.apache.hadoop.fs.Path(tombstoneRoot(root))
    val fs = tr.getFileSystem(spark.sessionState.newHadoopConf())
    val observed = batches(spark, root).map(new org.apache.hadoop.fs.Path(_))
    if (observed.isEmpty) return 0
    val tomb = spark.read.parquet(observed.map(_.toString): _*)
      .select(col(idCol))
    val n = BatchStore.compact(spark, root, newBatchId,
      (merged: DataFrame) => merged.join(tomb, Seq(idCol), "left_anti"),
      onBeforeCommit, partitionBy)
    observed.foreach(p => fs.delete(p, true))
    // retire the parent dir too if no delete raced in (non-recursive:
    // refuses — and is ignored — if a racing tombstone just committed)
    if (batches(spark, root).isEmpty)
      try fs.delete(tr, false) catch { case _: java.io.IOException => () }
    n
  }
}
