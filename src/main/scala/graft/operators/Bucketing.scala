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

  /** Write `df` as a bucketed managed table on `key`. Idempotent
    * across SESSIONS, not just runs: the in-memory catalog of a fresh
    * JVM has forgotten last session's table while its warehouse
    * directory survives, and `saveAsTable` refuses the orphaned
    * location — so drop the table AND clear a leftover location
    * first. When the table exists the location comes from the catalog
    * (authoritative under any database/case); only for a
    * catalog-unknown orphan is it derived, mirroring `saveAsTable`'s
    * own rules (current database's location + lowercased table name).
    * Refuses a self-referential write (`writeBucketed(spark.table(t),
    * t, …)`): the eager drop+delete would destroy the lazy write's
    * own input. */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit = {
    val spark = df.sparkSession
    val catalog = spark.sessionState.catalog
    val ident = spark.sessionState.sqlParser.parseTableIdentifier(table)
    val loc =
      if (catalog.tableExists(ident))
        new org.apache.hadoop.fs.Path(catalog.getTableMetadata(ident).location)
      else {
        val db = ident.database.getOrElse(catalog.getCurrentDatabase)
        new org.apache.hadoop.fs.Path(
          new org.apache.hadoop.fs.Path(catalog.getDatabaseMetadata(db).locationUri),
          ident.table.toLowerCase)
      }
    val fs = loc.getFileSystem(spark.sessionState.newHadoopConf())
    val target = fs.makeQualified(loc).toString
    // Path(String), not Path(new URI(f)): inputFiles strings are not
    // percent-encoded — a space in the path would make URI throw
    val reads = df.inputFiles.map(f =>
      new org.apache.hadoop.fs.Path(f).toString)
    require(!reads.exists(f => f == target || f.startsWith(target + "/")),
      s"bucketed write reads its own target location $target; stage the input first")
    spark.sql(s"DROP TABLE IF EXISTS ${ident.quotedString}")
    if (fs.exists(loc)) fs.delete(loc, true)
    df.write
      .bucketBy(buckets, key)
      .sortBy(key)
      .mode("overwrite")
      .format("parquet")
      .saveAsTable(table)
  }

  /** Join two same-bucketed tables on their bucket key: no exchange.
    * The zero-shuffle contract is enforced, not assumed: both tables
    * must be bucketed on `key` with equal bucket counts, otherwise the
    * planner would silently reintroduce the exchange this module
    * exists to eliminate. */
  def colocatedJoin(spark: SparkSession, left: String, right: String,
      key: String): DataFrame = {
    def spec(t: String) = spark.sessionState.catalog
      .getTableMetadata(spark.sessionState.sqlParser.parseTableIdentifier(t))
      .bucketSpec
      .getOrElse(throw new IllegalArgumentException(s"table $t is not bucketed"))
    val (l, r) = (spec(left), spec(right))
    // Spark resolves the join key case-insensitively; compare likewise.
    def onKey(s: org.apache.spark.sql.catalyst.catalog.BucketSpec) =
      s.bucketColumnNames.map(_.toLowerCase) == Seq(key.toLowerCase)
    require(onKey(l) && onKey(r),
      s"both tables must be bucketed on '$key' (got ${l.bucketColumnNames} / ${r.bucketColumnNames})")
    require(l.numBuckets == r.numBuckets,
      s"bucket counts must match for a co-located join (got ${l.numBuckets} vs ${r.numBuckets})")
    spark.table(left).join(spark.table(right), key)
  }
}
