package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bloom-filter join pruning — the explicit form of the runtime-filter
  * pattern: keep only corpus rows whose key appears in an allowlist
  * that is too big to broadcast exactly but trivially fits as a bloom
  * sketch (~1.2 GB per 10⁹ keys at 1% fpp, vs tens of GB for an exact
  * hash set). The sketch prefilters map-side; an exact semi join over
  * the survivors removes the false positives, so the RESULT is exact —
  * only the shuffle shrinks (by the corpus's non-matching fraction,
  * typically the overwhelming majority in decontamination/allowlist
  * workloads).
  *
  * The bloom build is `df.stat.bloomFilter` — a distributed,
  * mergeable aggregation (one pass over the keys). The probe is a
  * broadcast of the immutable sketch into a scala predicate; a UDF is
  * the supported way to evaluate `mightContain` per row (Spark's own
  * runtime row-group filtering uses the same sketch internally but
  * exposes no public expression), and it sits in a plain Filter that
  * AQE places below the join's exchange — pinned in PlanSpec (q81).
  */
object BloomPrune {

  /** Exact semi join of `big` against `keys`' `keyCol` (LongType),
    * with a bloom prefilter so non-matching `big` rows never reach the
    * join shuffle. `expectedKeys` sizes the sketch; `fpp` trades
    * sketch bytes for the fraction of non-matching rows that slip
    * into the exact join (cost, never correctness). */
  def semiJoin(big: DataFrame, bigKey: Column, keys: DataFrame, keyCol: String,
      expectedKeys: Long, fpp: Double): DataFrame = {
    val bloom = keys.stat.bloomFilter(keyCol, expectedKeys, fpp)
    val bc = big.sparkSession.sparkContext.broadcast(bloom)
    val mightContain = udf((k: Long) => bc.value.mightContainLong(k))
    big.filter(mightContain(bigKey))
      .join(keys.select(col(keyCol)).distinct(),
        bigKey === col(keyCol), "left_semi")
  }
}
