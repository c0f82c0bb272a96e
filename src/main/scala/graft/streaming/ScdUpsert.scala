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

  /** Newest COMMITTED version directory strictly below `belowBatch`.
    * Committed = the writer's `_SUCCESS` marker exists: a version
    * directory appears on the filesystem before its write job commits,
    * so bare existence would let an external reader (or a reader racing
    * the in-flight batch) pick a partial version — and a mid-write
    * crash would leave that partial version looking newest until the
    * stream restarts. Overwrite-mode retries clear the marker first,
    * so a retried batch's partial output is never committed-visible. */
  def latestVersion(spark: SparkSession, dimRoot: String,
      belowBatch: Long = Long.MaxValue): Option[String] = {
    val root = new Path(dimRoot)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(root)) None
    else fs.listStatus(root).toSeq
      .filter(_.isDirectory)
      .map(_.getPath)
      .filter(p => p.getName.matches("v\\d+") &&
        fs.exists(new Path(p, "_SUCCESS")))
      .map(_.getName.drop(1).toLong)
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
        val existing = latestVersion(spark, dimRoot, belowBatch = batchId)
          .map(spark.read.parquet(_))
        val next = ScdType2(batch, existing, idCol, attrCols, tracked, skCol,
          asOfForBatch(batchId))
        next.write.mode("overwrite").parquet(s"$dimRoot/v$batchId")
        // the write consumed every frame ScdType2 checkpointed this
        // batch; release exactly THOSE (plan-reachable) blocks so
        // stream storage stays O(1). Never a session-wide sweep — that
        // would unpersist frames a concurrent job on the shared
        // session still needs.
        graft.operators.Checkpoints.releasePinned(next)
        ()
      }
      .start()
}
