package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** Adaptive PARALLELISM FLOOR for expensive map chains over
  * row-group-bound inputs — the spark_optimization_guide §2.5 "input
  * skew / one huge unsplittable file" fix, applied adaptively.
  *
  * The problem it solves: parquet splits cannot cross a row-group
  * boundary, so a single-row-group file yields a ONE-task scan no
  * matter how many byte-range splits Spark plans or how many cores
  * the session has — and every NARROW map chain above the scan
  * (tokenize → md5-gram embedding, shingle MinHash, PNG
  * encode/decode, feature hashing) inherits that single task. The
  * r19 profile of the token-index gate showed ~70% of its job time
  * in 1-task jobs on a 32-core session; the bench's 8-vs-32-core
  * scaling block (ratios clustered at 1.0) is the same signature
  * suite-wide.
  *
  * The fix: ONE hash exchange of the raw rows on a caller-named
  * high-cardinality key, with an EXPLICIT partition count
  * (`defaultParallelism`) so AQE's advisory-size coalescing cannot
  * collapse the tiny-but-expensive rows back to one partition (the
  * rows are kilobytes; the work per row is the expensive part, which
  * byte-based coalescing cannot see).
  *
  * SCALE-ADAPTIVE, not a local[32] tune: when the input already
  * carries at least half the session's default parallelism — any
  * real multi-file / multi-row-group corpus, i.e. the 100 TB case —
  * this is a NO-OP returning `df` unchanged, so production plans
  * never pay the extra exchange. It engages exactly on the
  * pathological input the guide names (few unsplittable blocks on a
  * much wider session).
  *
  * Value-neutral where applied: it moves ROW PLACEMENT only, and
  * every consumer downstream of a spread in this library is
  * order-free (exact fixed-point sums, min/max, `sort_array`'d
  * collects, explicitly-ordered windows). Never use it above
  * partition-order-SENSITIVE derivations (`monotonically_increasing_id`,
  * `spark_partition_id` — the [[SurrogateKeys]] path). */
private[graft] object Parallelism {

  /** `df`, hash-spread on `keys` to `defaultParallelism` partitions
    * when its current layout is severely under-parallel (fewer than
    * half the session's cores), else `df` unchanged. `keys` must be
    * (jointly) high-cardinality — a low-cardinality key would hash
    * the rows into few partitions and waste the exchange. */
  def spread(df: DataFrame, keys: String*): DataFrame = {
    require(keys.nonEmpty, "spread needs at least one key column")
    val p = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions * 2 >= p) df
    else df.repartition(p, keys.map(col): _*)
  }
}
