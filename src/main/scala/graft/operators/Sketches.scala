package graft.operators

import org.apache.spark.sql.DataFrame
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
