package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for heavy-hitter keys.
  *
  * Aggregation-side skew: [[saltedSum]] splits each key into `buckets`
  * salted sub-keys so no single reducer owns a heavy hitter, then
  * merges the partials — two shuffles, both uniform. Spark's partial
  * aggregation already combines map-side, so salting only pays off
  * when the DISTINCT-VALUE state per key (not the row count) is the
  * bottleneck — e.g. count-distinct state or collect-style aggregates;
  * for plain sums prefer the built-in partial aggregation and let AQE
  * coalesce.
  *
  * Join-side skew is AQE's job — enabled in [[graft.Sessions]]
  * (`spark.sql.adaptive.skewJoin.enabled` defaults on): skewed
  * partitions split at runtime with no salting gymnastics. Reach for
  * manual key-salting of joins only when one specific hot key is known
  * a priori (append salt to the fact side, explode the dim side).
  */
object Skew {

  private val SaltCol = "__graft_salt"
  private val ValCol = "__graft_v"

  private def requireFree(df: DataFrame): Unit =
    require(!df.columns.exists(c => c == SaltCol || c == ValCol),
      s"input already defines internal column $SaltCol/$ValCol")

  /** Two-phase salted sum+count per key, equivalent to
    * `sum(CAST(value AS DECIMAL(28,9))) , count(*)` per key; immune to
    * single-key reducer hot-spotting. The decimal aggregation makes
    * the two-phase split value-identical to the direct aggregation —
    * with decimal's domain: |value| < 1e19 (ANSI cast overflow fails
    * the job beyond that) and quantization at 1e-9. The salt is
    * DETERMINISTIC (hash of the value): a salt from partition id or
    * monotonically_increasing_id would re-salt rows differently when a
    * stage retries after a fetch failure, double-counting or dropping
    * rows. */
  def saltedSum(df: DataFrame, keys: Seq[String], value: Column,
      buckets: Int): DataFrame = {
    requireFree(df)
    val salted = df.withColumn(SaltCol, pmod(xxhash64(value), lit(buckets)))
    val phase1 = salted
      .groupBy((keys.map(col) :+ col(SaltCol)): _*)
      .agg(sum(value.cast("decimal(28,9)")).as("_psum"), count(lit(1)).as("_pcnt"))
    phase1.groupBy(keys.map(col): _*)
      .agg(sum(col("_psum")).cast("double").as("total"),
        sum(col("_pcnt")).cast("long").as("n_rows"))
  }

  /** Two-phase exact count-distinct: phase 1 dedupes (key, value)
    * WITH a salt derived from the value (uniform by construction, no
    * hot reducer even when one key holds most rows), phase 2 counts
    * per key. The classic fix for count-distinct state skew. */
  def saltedCountDistinct(df: DataFrame, keys: Seq[String], value: Column,
      buckets: Int): DataFrame = {
    requireFree(df)
    val salted = df
      .withColumn(ValCol, value)
      .withColumn(SaltCol, pmod(xxhash64(value), lit(buckets)))
    val phase1 = salted
      .select((keys.map(col) :+ col(SaltCol) :+ col(ValCol)): _*)
      .distinct()
      .groupBy((keys.map(col) :+ col(SaltCol)): _*)
      .agg(count(col(ValCol)).as("_pd"))
    phase1.groupBy(keys.map(col): _*)
      .agg(sum(col("_pd")).cast("long").as("n_distinct"))
  }
}
