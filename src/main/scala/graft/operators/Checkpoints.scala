package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.LogicalRDD

/** Targeted release for localCheckpoint'd frames: unpersists exactly
  * the checkpointed RDDs reachable from a frame's plan — never a
  * session-wide sweep, which would clobber caches or checkpoints a
  * CONCURRENT job pinned (for a localCheckpoint the blocks ARE the
  * data; an outside unpersist is unrecoverable, lineage is gone).
  *
  * Only call once nothing will read the frame again. The complement of
  * [[graft.Bench.releaseBlocks]] (a deliberate whole-session sweep
  * between isolated bench runs): operators and long-lived services use
  * THIS, the bench uses that.
  */
object Checkpoints {
  def releasePinned(df: DataFrame): Unit =
    df.queryExecution.analyzed.foreach {
      case r: LogicalRDD => r.rdd.unpersist(blocking = false)
      case _ => ()
    }

  /** Release the checkpoints among `intermediates` that `result`'s plan
    * no longer reaches. An operator that eagerly re-checkpoints
    * downstream (e.g. the zipWithIndex re-key, whose output is a fresh
    * LogicalRDD with RDD-level — plan-invisible — lineage) strands its
    * upstream checkpoints: already fully consumed, yet unreachable by
    * [[releasePinned]] on the result. Safe exactly because
    * unreachable-from-the-plan means some eager downstream
    * materialization copied everything that mattered. */
  def releaseConsumed(result: DataFrame, intermediates: Seq[DataFrame]): Unit = {
    val live = result.queryExecution.analyzed.collect {
      case r: LogicalRDD => r.rdd.id
    }.toSet
    intermediates.foreach(_.queryExecution.analyzed.foreach {
      case r: LogicalRDD if !live.contains(r.rdd.id) =>
        r.rdd.unpersist(blocking = false)
      case _ => ()
    })
  }
}
