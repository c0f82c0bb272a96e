package graft.streaming

import java.time.LocalDate

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.{ScdType2, SnapshotCommit}

/** Streaming SCD Type 2 maintenance: dimension snapshots arrive as a
  * stream and each micro-batch merges into the versioned dimension via
  * `foreachBatch` — the Structured-Streaming-native form of the
  * reference's batch rebuild (`python/scd_implementation.py:102-132`;
  * its README lists incremental loading as future work).
  *
  * State layout: the dimension lives as immutable snapshot versions
  * under the [[graft.operators.SnapshotCommit]] protocol (write-once
  * data dirs published by atomic manifest rename); each batch reads
  * the LATEST COMMITTED version strictly below its own batch id,
  * applies the same [[graft.operators.ScdType2]] the batch pipeline
  * uses, and commits a new version. That gives exactly-once semantics
  * without a transactional table format: a retried batch re-reads the
  * same predecessor (its own partial output is uncommitted or above
  * the cutoff, never visible to itself) and republishes its version
  * atomically — a crash at any point, including mid-directory, leaves
  * the previous snapshot fully readable and the partial one invisible.
  * This is classic Delta/Iceberg MERGE territory — the manifest
  * protocol is the dependency-free stand-in, with the same
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

  /** Data directory of the newest COMMITTED version strictly below
    * `belowBatch` — resolved through [[SnapshotCommit]]'s manifests
    * only, never by listing data dirs: a crashed or in-flight writer's
    * partial directory has no manifest and is invisible here. */
  def latestVersion(spark: SparkSession, dimRoot: String,
      belowBatch: Long = Long.MaxValue): Option[String] =
    SnapshotCommit.latestBelow(spark, dimRoot, belowBatch)
      .map(v => SnapshotCommit.dataPath(spark, dimRoot, v))

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
        SnapshotCommit.write(next, dimRoot, batchId)
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
