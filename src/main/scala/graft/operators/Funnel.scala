package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Ordered-funnel analysis over an event log: how many entities reach
  * each stage of `stages` IN ORDER — stage k counts only when an event
  * of stage k's type occurs at-or-after the entity's first in-order
  * reach of stage k-1 (the product-analytics "view → click → purchase"
  * conversion question; the reference's claim lifecycle — submitted →
  * adjudicated → paid — is the same shape).
  *
  * Shape (100 TB): ONE shuffle, on the entity key. Events are filtered
  * to the funnel's stage types BEFORE the shuffle (map-side, pushes
  * into the scan as an `In` filter), and the per-entity state after the
  * groupBy is one sorted timestamp array per stage — bounded by the
  * entity's own stage-event count, never the corpus. The stage-k reach
  * is then a pure per-row array expression (`filter` + `element_at`),
  * and the final stage counts are a single global aggregation of K
  * counters. No self-join, no per-stage pass over the corpus, no
  * window. An entity with millions of repeat events would bloat its
  * array state; pre-dedupe to (entity, stage, coarse time bucket)
  * upstream if the log has such hot entities.
  */
object Funnel {

  /** Per-stage entity counts: `(stage_ord, stage, n_entities,
    * pct_of_first)` — `n_entities` reached the stage in order;
    * `pct_of_first` is the exact ratio vs the funnel's first stage
    * (one IEEE division of two integers — cross-engine deterministic).
    */
  def stageCounts(events: DataFrame, entityCol: String, tsCol: Column,
      typeCol: Column, stages: Seq[String]): DataFrame = {
    require(stages.nonEmpty, "need at least one funnel stage")
    require(stages.distinct == stages, s"duplicate stage in $stages")

    // One sorted ts array per stage; collect_list drops the nulls the
    // `when` leaves for other stages' events.
    val tsArrays = stages.zipWithIndex.map { case (st, i) =>
      sort_array(collect_list(when(typeCol === st, tsCol))).as(s"__ts_$i")
    }
    val perEntity = events
      .filter(typeCol.isin(stages: _*))
      .groupBy(col(entityCol))
      .agg(tsArrays.head, tsArrays.tail: _*)

    // reach_0 = first stage-0 event; reach_k = first stage-k event
    // at-or-after reach_{k-1}. A null reach_{k-1} nulls the lambda's
    // comparison, so the filter keeps nothing and reach_k is null too.
    // try_element_at: an entity missing a stage entirely has an empty
    // array, which must yield null, not an ANSI index error.
    val withReach = stages.indices.foldLeft(perEntity) { (d, i) =>
      val reach =
        if (i == 0) try_element_at(col("__ts_0"), lit(1))
        else try_element_at(
          filter(col(s"__ts_$i"), t => t >= col(s"__reach_${i - 1}")), lit(1))
      d.withColumn(s"__reach_$i", reach)
    }

    val counts = withReach.agg(
      count(col("__reach_0")).as("__n_0"),
      stages.indices.tail.map(i => count(col(s"__reach_$i")).as(s"__n_$i")): _*)

    val stageRows = stages.zipWithIndex.map { case (st, i) =>
      struct(
        lit(i + 1).as("stage_ord"), lit(st).as("stage"),
        col(s"__n_$i").as("n_entities"),
        (col(s"__n_$i").cast("double") / col("__n_0")).as("pct_of_first"))
    }
    counts
      .select(explode(array(stageRows: _*)).as("s"))
      .select(col("s.stage_ord"), col("s.stage"), col("s.n_entities"),
        col("s.pct_of_first"))
      .orderBy(col("stage_ord"))
  }
}
