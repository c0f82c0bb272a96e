package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Count–min-sketch surface: frequency estimation in fixed memory —
  * the single-pass companion to the HLL distinct-count sketch (q57).
  *
  * At 100 TB the exact per-key count behind a heavy-hitter report is a
  * full shuffle of the key domain; the CMS is one map-side pass into
  * `depth × width` counters (mergeable across partitions — Spark's
  * `stat.countMinSketch` merges partials exactly like any partial
  * aggregate). The CMS guarantee: `exact ≤ est ≤ exact + ε·N` with
  * probability `1 − δ` per key, `width = ⌈e/ε⌉`, `depth = ⌈ln(1/δ)⌉`.
  *
  * Like q57, the engine-specific estimate never leaves the query: it
  * feeds only the `within_eps` boolean, so every output column is
  * oracle-comparable and the gate genuinely fails if the sketch
  * drifts outside its published envelope.
  */
object Sketches {

  /** Exact top-`k` heavy hitters by frequency of `keyCol` (LongType),
    * each annotated with whether the CMS estimate honors the
    * `exact ≤ est ≤ exact + ε·N` envelope. Two corpus passes: the
    * exact groupBy (the at-scale replaceable one) and the sketch
    * build. The estimate lookup runs on k rows only, after the
    * TakeOrdered — a broadcast sketch probe, not a hot-path UDF.
    */
  /** Per-group approximate median with its rank-error envelope: the
    * Greenwald–Khanna sketch behind `percentile_approx` guarantees the
    * returned element's rank is within `n/accuracy` of `n/2`. The
    * approx VALUE never leaves the query (engine-specific); it feeds
    * only `within_rank_bound` — the exact count of values ≤ it, which
    * must land inside the envelope (±1 slack for duplicate runs).
    *
    * One sketch pass + one rank-audit pass. At 100 TB the audit pass
    * is a test-time device (the q80 gate); production keeps only the
    * single-pass mergeable sketch — the point over an exact median,
    * which needs a full sort or two-phase selection of the value
    * domain. */
  def approxMedianChecked(df: DataFrame, groupCol: String, valueCol: String,
      accuracy: Int): DataFrame = {
    val agg = df.groupBy(col(groupCol)).agg(
      count(lit(1)).as("n_rows"),
      percentile_approx(col(valueCol), lit(0.5), lit(accuracy)).as("approx"))
    val ranks = df.join(broadcast(agg.select(col(groupCol), col("approx"))), Seq(groupCol))
      .groupBy(col(groupCol))
      .agg(sum(when(col(valueCol) <= col("approx"), 1L).otherwise(0L)).as("rank_le"))
    val n = col("n_rows").cast("double")
    agg.join(ranks, Seq(groupCol))
      .select(col(groupCol), col("n_rows"),
        (col("rank_le") >= n * 0.5 - n / accuracy - 1 &&
          col("rank_le") <= n * 0.5 + n / accuracy + 1).as("within_rank_bound"))
  }

  /** K-minimum-values (KMV) sketch per group: the `k` smallest
    * DISTINCT values of `valueCol` (a hashed domain — shingle hashes,
    * content digests) for each `groupCol` — the classic mergeable set
    * sketch behind distinct-count and set-overlap estimation
    * (Bar-Yossef et al. 2002; Beyer et al., SIGMOD'07). The output is
    * RELATIONAL — `(group, value)` rows, ≤ k per group — so any
    * engine can intersect/union sketches with plain joins and the
    * result is exact-integer comparable (no engine-private binary
    * blobs, unlike HLL registers).
    *
    * Skew design (100 TB): a naive per-GROUP window rank puts each
    * group's entire hashed domain in ONE task — with 20 sources that
    * is 20 tasks total, each corpus/20 wide. The bottom-k here is
    * two-level: first per `(group, value % fanout)` cell (fanout×
    * the parallelism, every partition bounded by the cell's domain
    * share), then a re-rank of the ≤ fanout·k survivors per group —
    * the second window sees sketch-sized input only. Correct because
    * the global bottom-k is a subset of the per-cell bottom-k's:
    * any value among the k smallest overall is among the k smallest
    * of its own cell. */
  def kMinValues(df: DataFrame, groupCol: String, valueCol: String,
      k: Int, fanout: Int = 32): DataFrame = {
    require(k >= 1, s"need k >= 1, got $k")
    require(fanout >= 1, s"need fanout >= 1, got $fanout")
    // NULLs are excluded, not ranked: NULLS FIRST ordering would let a
    // single null value displace a real minimum from every sketch
    val distinctVals = df.select(col(groupCol), col(valueCol))
      .filter(col(valueCol).isNotNull).distinct()
    val cell = Window
      .partitionBy(col(groupCol), pmod(col(valueCol), lit(fanout.toLong)))
      .orderBy(col(valueCol))
    val group = Window.partitionBy(col(groupCol)).orderBy(col(valueCol))
    distinctVals
      .withColumn("__rn1", row_number().over(cell)).filter(col("__rn1") <= k)
      .withColumn("__rn2", row_number().over(group)).filter(col("__rn2") <= k)
      .drop("__rn1", "__rn2")
  }

  def heavyHittersChecked(df: DataFrame, keyCol: String, k: Int,
      eps: Double, confidence: Double, seed: Int): DataFrame = {
    val spark = df.sparkSession
    val cms = df.stat.countMinSketch(keyCol, eps, confidence, seed)
    val slack = math.ceil(eps * cms.totalCount()).toLong
    val bc = spark.sparkContext.broadcast(cms)
    val estimate = udf((key: Long) => bc.value.estimateCount(key))
    df.groupBy(col(keyCol)).agg(count(lit(1)).as("n_rows"))
      .orderBy(col("n_rows").desc, col(keyCol))
      .limit(k)
      .withColumn("est", estimate(col(keyCol)))
      .select(col(keyCol), col("n_rows"),
        (col("est") >= col("n_rows") &&
          col("est") <= col("n_rows") + lit(slack)).as("within_eps"))
  }
}
