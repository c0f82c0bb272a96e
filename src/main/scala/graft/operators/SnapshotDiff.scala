package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Snapshot differencing — the CDC primitive between two versions of
  * the same table: which keys were added, removed, or changed (on a
  * chosen set of tracked columns), and which survived untouched.
  * [[ScdType2]] consumes exactly this classification to build history;
  * this operator exposes it standalone, the way a 100 TB lakehouse
  * compacts "yesterday's export vs today's" into an incremental feed.
  *
  * Shape: ONE full-outer shuffle join on the key (the unavoidable
  * comparison); change predicates are null-safe `<=>` on the tracked
  * columns, evaluated in the join's projection — no second pass, no
  * driver-side state. At scale both sides arrive hash-partitioned on
  * the key, so AQE handles skew and the join never broadcasts the big
  * side.
  */
object SnapshotDiff {

  /** `(key..., change_type)` for every key present in either snapshot:
    * `added` (only in `next`), `removed` (only in `prev`), `changed`
    * (in both, some tracked column differs null-safely), `unchanged`.
    */
  def diff(prev: DataFrame, next: DataFrame, keyCols: Seq[String],
      trackedCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty, "keyCols must be non-empty")
    require(!keyCols.contains("change_type") && !trackedCols.contains("change_type"),
      "column change_type is reserved")
    val p = prev.select((keyCols ++ trackedCols).map(col): _*)
      .withColumn("__in_prev", lit(true))
    val n = next.select((keyCols ++ trackedCols).map(col): _*)
      .withColumn("__in_next", lit(true))
    val renamedP = trackedCols.foldLeft(p)((d, c) => d.withColumnRenamed(c, s"__prev_$c"))
    val renamedN = trackedCols.foldLeft(n)((d, c) => d.withColumnRenamed(c, s"__next_$c"))

    val anyChange: Column = trackedCols
      .map(c => !(col(s"__prev_$c") <=> col(s"__next_$c")))
      .reduceOption(_ || _).getOrElse(lit(false))

    renamedP.join(renamedN, keyCols, "full_outer")
      .withColumn("change_type",
        when(col("__in_prev").isNull, lit("added"))
          .when(col("__in_next").isNull, lit("removed"))
          .when(anyChange, lit("changed"))
          .otherwise(lit("unchanged")))
      .select(keyCols.map(col) :+ col("change_type"): _*)
  }
}
