package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import TextFunctions.hash60

/** Deterministic sampling / capping for training-data curation.
  *
  * Random sampling (`df.sample`) is the wrong tool for corpus curation:
  * the selected set changes across runs, stage retries, and engines, so
  * a pipeline can't be re-run reproducibly and an oracle can't check
  * it. Both operators here select by a content-derived hash
  * ([[TextFunctions.hash60]], a 60-bit md5 prefix that DuckDB
  * reproduces exactly), so the sample is a pure function of the data:
  * stable across runs, engines, partitionings, and stage retries.
  *
  * Scale notes (100 TB):
  *  - [[hashSample]] is a map-side filter — no shuffle, pushes through
  *    column pruning, composes with any downstream operator.
  *  - [[capPerGroup]] is one shuffle on the group key with the
  *    `row_number <= n` filter in Catalyst's `InferWindowGroupLimit`
  *    shape, so each map partition forwards at most n rows per group
  *    (partial group-limit below the exchange) — a hot group (one
  *    dominant language) costs n·P rows, never its full row count.
  */
object Sampling {

  /** Keep rows whose key hashes into `num` of `denom` buckets —
    * a deterministic `num/denom` sample. */
  def hashSample(df: DataFrame, keyCol: Column, num: Int, denom: Int): DataFrame = {
    require(num >= 0 && num <= denom, s"need 0 <= num=$num <= denom=$denom")
    df.filter(pmod(hash60(keyCol), lit(denom.toLong)) < num)
  }

  /** Cap each group at `n` rows, selected in deterministic hash order
    * of `keyCol` (ties broken by the key itself). The per-group
    * selection is uniform-without-replacement in expectation but fully
    * reproducible.
    *
    * `keyCol` must be unique within each group for the selected ROWS
    * to be deterministic (same contract as
    * [[SurrogateKeys.sequentialKeys]]'s orderCols): duplicated keys
    * straddling the rank-n boundary leave the survivor choice to
    * partition-input order. */
  def capPerGroup(df: DataFrame, groupCols: Seq[String], keyCol: Column,
      n: Int): DataFrame = {
    require(!df.columns.contains("__graft_rn"), "input already defines __graft_rn")
    val w = Window.partitionBy(groupCols.map(col): _*)
      .orderBy(hash60(keyCol), keyCol)
    // raw-int rank vs literal, cast dropped after the filter: the exact
    // shape InferWindowGroupLimit recognizes (see Similarity.rankTopK)
    df.withColumn("__graft_rn", row_number().over(w))
      .filter(col("__graft_rn") <= n)
      .drop("__graft_rn")
  }
}
