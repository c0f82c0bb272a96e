package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (last-prior-observation) association — the time-series
  * operator Spark lacks natively. Implemented per the preference order
  * (SURVEY.md §4 / spark guide): as a COMPOSITION of built-ins — a
  * last-non-null carry-forward window over the unioned timeline — not
  * a custom join node. This shape covers the common cases (attribution,
  * last-known-price, sensor backfill) with one shuffle on the
  * partition key and bounded per-key window state; a dedicated
  * SortMergeAsOfJoinExec would only pay off with two huge co-sorted
  * relations and a tolerance bound.
  */
object AsOf {

  /** Carry the last non-null `value` forward along each partition's
    * event-time order into column `as`. Rows where `value` is non-null
    * observe themselves (frame ends at CURRENT ROW). */
  def lastCarriedForward(df: DataFrame, partition: Seq[String],
      order: Seq[Column], value: Column, as: String): DataFrame = {
    val w = Window.partitionBy(partition.map(col): _*).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn(as, last(value, ignoreNulls = true).over(w))
  }
}
