package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table layout for co-located joins — the 100 TB answer to
  * repeatedly joining two fact-scale tables on the same key (e.g.
  * orders ⋈ lineitem): both sides are written pre-hash-partitioned
  * into the same number of buckets on the join key, so the join plans
  * as a zero-shuffle sort-merge over matching buckets.
  *
  * This is the Spark analog of the reference's BigQuery clustering
  * spec (`python/load.py:100-103`) taken one step further: clustering
  * gives locality within storage; bucketing removes the runtime
  * exchange entirely. Verified by plan assertion in BucketingSpec
  * (no `Exchange` above either scan).
  */
object Bucketing {

  /** Write `df` as a bucketed managed table on `key`. */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit =
    df.write
      .bucketBy(buckets, key)
      .sortBy(key)
      .mode("overwrite")
      .format("parquet")
      .saveAsTable(table)

  /** Join two same-bucketed tables on their bucket key: no exchange. */
  def colocatedJoin(spark: SparkSession, left: String, right: String,
      key: String): DataFrame =
    spark.table(left).join(spark.table(right), key)
}
