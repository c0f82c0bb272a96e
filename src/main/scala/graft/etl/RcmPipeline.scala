package graft.etl

import java.time.LocalDate

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.ScdType2

/** End-to-end pipeline — the Spark re-expression of the reference's
  * entry point (`/root/reference/python/scd_implementation.py:102-132`):
  * extract → transform → model → SCD2 on dim_patients → persist.
  *
  * Differences from the reference, both deliberate:
  *  - `asOf` replaces wall-clock `datetime.now()` (determinism);
  *  - the reference's subsequent-run SCD path crashes on real changes
  *    (it reads `version_old` from a merge that never suffixes
  *    `version`, `scd_implementation.py:66` — only its first-run path
  *    ever succeeded, hence all-version-1 staging output). We implement
  *    the documented intent (SURVEY.md §2.10) via [[ScdType2]].
  */
object RcmPipeline {

  val scdTrackedAttrs: Seq[String] = Seq("Address", "LastName")
  val dimPatientAttrs: Seq[String] =
    Seq("FirstName", "LastName", "Gender", "age", "Address", "source_hospital")

  final case class Result(star: RcmModeling.StarSchema, validation: RcmModeling.Validation)

  def run(spark: SparkSession, refDir: String, asOf: LocalDate,
      existingDimPatients: Option[DataFrame] = None): Result =
    runRaw(RcmExtraction.runOnReferenceData(spark, refDir), asOf, existingDimPatients)

  /** Same pipeline over already-extracted raw data — the entry point a
    * JDBC deployment uses after [[RcmExtraction.run]] with
    * [[RcmExtraction.JdbcSource]]s (exercised in JdbcSourceSpec). */
  def runRaw(raw: RcmExtraction.RawData, asOf: LocalDate,
      existingDimPatients: Option[DataFrame] = None): Result = {
    val asOfCol = lit(java.sql.Date.valueOf(asOf))
    val (tables, claims) = RcmTransform.run(raw, asOfCol)

    // Dimensions first, then SCD2 on dim_patients, THEN facts — so
    // fact patient_sk always resolves against the SCD-maintained dim's
    // current rows (the reference rebuilds facts each run against the
    // re-keyed dim, `dimensional_modeling.py:60`).
    val dims = RcmModeling.createDimensions(tables)
    val newSnapshot = dims("dim_patients")
      .select(("unified_patient_id" +: dimPatientAttrs).map(col): _*)
    val scdDim = ScdType2(newSnapshot, existingDimPatients, "unified_patient_id",
      dimPatientAttrs, scdTrackedAttrs, "patient_sk", asOf)
    val dimsWithScd = dims + ("dim_patients" -> scdDim)

    val facts = RcmModeling.createFacts(tables, claims, dimsWithScd)
    val star = RcmModeling.StarSchema(dimsWithScd, facts)
    Result(star, RcmModeling.validate(star))
  }

  /** One table's write-then-verify reconciliation: rows the pipeline
    * computed vs rows actually re-readable from the sink (the
    * reference's post-load validation, `load.py:115-119`). */
  final case class TableLoad(name: String, written: Long, reloaded: Long) {
    def reconciled: Boolean = written == reloaded
  }

  /** S4/S5 analog: persist the star schema as parquet and reconcile
    * every table — write, re-read from the sink, compare counts. A
    * mismatch (lost task output, partial overwrite, sink corruption)
    * throws rather than letting a silently-short table flow downstream.
    *
    * The BigQuery clustering spec (`load.py:100-103`) maps to
    * sort-within-partition layout: facts by `patient_sk`, dim_patients
    * by `(unified_patient_id, is_current)` — giving the same locality
    * for sk-point queries that BQ clustering gives.
    *
    * Scale notes: the written count comes from the same cached frame
    * the write consumed (one extra count job over in-memory/sink-local
    * data, never a pipeline recompute); the reloaded count is a
    * parquet-footer metadata scan. Both are O(partitions), not
    * O(data). */
  def write(star: RcmModeling.StarSchema, outDir: String): Seq[TableLoad] = {
    val clustering: Map[String, Seq[String]] = Map(
      "fact_transactions" -> Seq("patient_sk"),
      "fact_claims" -> Seq("patient_sk"),
      "dim_patients" -> Seq("unified_patient_id", "is_current"))
    // each table's pin+count+write+reload chain is independent of the
    // others' (distinct sink paths) — overlap them so one table's job
    // tail back-fills the next's (guide §2.6, r19; the sequential loop
    // paid ~4 actions × |tables| straggler tails)
    val loads = graft.operators.ParallelJobs.map(
      (star.dimensions ++ star.facts).toSeq.map { case (name, df) => () => {
        val out = clustering.get(name) match {
          case Some(cols) => df.sortWithinPartitions(cols.map(col): _*)
          case None       => df
        }
        // Materialize once: the count and the write must see the SAME
        // rows (an uncached lazy plan could legitimately recompute
        // differently only in the presence of a bug upstream — exactly
        // what reconciliation exists to catch, not mask).
        val pinned = out.localCheckpoint()
        val written = pinned.count()
        val spark = df.sparkSession
        pinned.write.mode("overwrite").parquet(s"$outDir/$name.parquet")
        val reloaded = spark.read.parquet(s"$outDir/$name.parquet").count()
        TableLoad(name, written, reloaded)
      }})
    val bad = loads.filterNot(_.reconciled)
    require(bad.isEmpty,
      s"post-load reconciliation failed: ${bad.mkString(", ")}")
    loads
  }
}
