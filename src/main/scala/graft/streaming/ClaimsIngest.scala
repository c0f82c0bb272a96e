package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.etl.{RcmSchemas, RcmTransform}

/** Incremental claims ingestion — the reference lists this as future
  * work (`README.md:179`); here it is as a Structured Streaming file
  * source: new claim CSV drops are discovered, source-tagged from the
  * filename (`python/extraction.py:99-106` semantics), cleaned with
  * the SAME RcmTransform.cleanClaims used by the batch pipeline, and
  * appended to parquet exactly-once (checkpointed file-source offsets).
  *
  * Scale notes: the file source tracks seen files in the checkpoint
  * (bounded metadata, `maxFilesPerTrigger` throttles burst catch-up);
  * cleaning is stateless map-side work; the sink is an append-only
  * partition-friendly parquet directory that the star-schema build
  * consumes incrementally.
  */
object ClaimsIngest {

  /** Source tag derived from the file's BASENAME (matching the whole
    * path would mis-tag any file under a directory named hospital1).
    * The else-branch default to hospital_b is the reference's own
    * semantics (`extraction.py:103` — 'hospital_a' if 'hospital1' in
    * filename else 'hospital_b'), preserved faithfully. */
  def tagged(raw: DataFrame): DataFrame = {
    val basename = element_at(split(input_file_name(), "/"), -1)
    raw.withColumn("source_hospital",
      when(lower(basename).contains("hospital1"), "hospital_a")
        .otherwise("hospital_b"))
  }

  def start(spark: SparkSession, watchDir: String, outDir: String,
      checkpointDir: String, maxFilesPerTrigger: Int = 100): StreamingQuery = {
    val raw = spark.readStream
      .option("header", "true")
      .option("maxFilesPerTrigger", maxFilesPerTrigger.toString)
      .schema(RcmSchemas.claims)
      .csv(watchDir)
    val cleaned = RcmTransform.cleanClaims(tagged(raw))
    cleaned.writeStream
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
      .start()
  }
}
