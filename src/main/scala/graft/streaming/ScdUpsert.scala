package graft.streaming

import java.time.LocalDate

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.ScdType2

/** Streaming SCD Type 2 maintenance: dimension snapshots arrive as a
  * stream and each micro-batch merges into the versioned dimension via
  * `foreachBatch` — the Structured-Streaming-native form of the
  * reference's batch rebuild (`python/scd_implementation.py:102-132`;
  * its README lists incremental loading as future work).
  *
  * State layout: the dimension lives as immutable parquet versions
  * `<dimRoot>/v<batchId>`; each batch reads the LATEST COMMITTED
  * version strictly below its own batch id, applies the same
  * [[graft.operators.ScdType2]] the batch pipeline uses, and writes a
  * new version. That gives exactly-once semantics without a
  * transactional table format: a retried batch re-reads the same
  * predecessor (its own partial output is above the cutoff, never
  * visible to itself) and idempotently overwrites its own version.
  * This is classic Delta/Iceberg MERGE territory — the versioned
  * directory is the dependency-free stand-in, with the same
  * read-committed contract.
  *
  * Scale notes: each merge is the batch SCD2 plan (one id-keyed
  * diff-join shuffle, no single-partition window); snapshot batches
  * must carry at most one row per business id (ScdType2's in-plan
  * guard fails the batch otherwise — dedupe upstream with
  * `dropDuplicatesWithinWatermark` or a latest-wins reduce). Blocks
  * checkpointed inside a batch are released before the next one, so a
  * long-running stream holds O(1) executor storage, not O(batches).
  */
object ScdUpsert {

  /** Newest committed version directory strictly below `belowBatch`. */
  def latestVersion(spark: SparkSession, dimRoot: String,
      belowBatch: Long = Long.MaxValue): Option[String] = {
    val root = new Path(dimRoot)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(root)) None
    else fs.listStatus(root).toSeq
      .filter(_.isDirectory)
      .map(_.getPath.getName)
      .filter(_.matches("v\\d+"))
      .map(_.drop(1).toLong)
      .filter(_ < belowBatch)
      .reduceOption(_ max _)
      .map(v => s"$dimRoot/v$v")
  }

  /** Current dimension state (None before the first committed batch). */
  def currentDim(spark: SparkSession, dimRoot: String): Option[DataFrame] =
    latestVersion(spark, dimRoot).map(spark.read.parquet(_))

  /** Start the upsert stream over `snapshots` (a STREAMING frame of
    * `idCol` + `attrCols` rows). `asOfForBatch` stamps each batch's
    * effective/expiry dates (production: `_ => LocalDate.now()`;
    * tests: fixed dates per batch id). */
  def start(spark: SparkSession, snapshots: DataFrame, dimRoot: String,
      checkpointDir: String, idCol: String, attrCols: Seq[String],
      tracked: Seq[String], skCol: String,
      asOfForBatch: Long => LocalDate): StreamingQuery =
    snapshots.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val sc = spark.sparkContext
        val pinnedBefore = sc.getPersistentRDDs.keySet
        val existing = latestVersion(spark, dimRoot, belowBatch = batchId)
          .map(spark.read.parquet(_))
        ScdType2(batch, existing, idCol, attrCols, tracked, skCol,
            asOfForBatch(batchId))
          .write.mode("overwrite").parquet(s"$dimRoot/v$batchId")
        // the write consumed every frame ScdType2 checkpointed this
        // batch — release them so stream storage stays O(1)
        (sc.getPersistentRDDs.keySet -- pinnedBefore)
          .foreach(id => sc.getPersistentRDDs.get(id)
            .foreach(_.unpersist(blocking = false)))
        ()
      }
      .start()
}
