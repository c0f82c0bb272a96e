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

  /** Inner equi-join that spreads a fact-side heavy-hitter key across
    * `buckets` reducers: every dim row is replicated once per salt
    * value (one `explode(sequence(...))` — dim grows ×`buckets`), each
    * fact row picks a DETERMINISTIC content-derived salt
    * (`xxhash64(saltBy) % buckets` — a partition-id or random salt
    * would re-salt rows differently on stage retry, duplicating or
    * dropping matches), and the join key becomes `(key, salt)`. A key
    * that owns 30% of the fact rows then lands on `buckets` reducers
    * instead of one.
    *
    * Use when the hot keys are known a priori and the dim side is too
    * big to broadcast but small enough to replicate ×`buckets`;
    * otherwise prefer AQE's runtime skew-join split
    * (`spark.sql.adaptive.skewJoin`, on in [[graft.Sessions]]), which
    * costs nothing when there is no skew. The `shuffle_hash` hint
    * keeps the replicated dim on the ShuffledHashJoin path: sort-merge
    * would re-sort the exploded side, and a broadcast would make the
    * salt pointless (PlanSpec pins the salted shuffle shape).
    *
    * `saltBy` should be fact columns that spread the hot key's rows —
    * a fine-grained row identity (e.g. order key + line number). */
  def saltedJoin(fact: DataFrame, factKey: String, dim: DataFrame,
      dimKey: String, saltBy: Seq[Column], buckets: Int): DataFrame = {
    requireFree(fact); requireFree(dim)
    require(buckets > 0, s"buckets must be positive, got $buckets")
    require(saltBy.nonEmpty, "saltBy must name at least one fact column")
    val sf = fact.withColumn(SaltCol, pmod(xxhash64(saltBy: _*), lit(buckets.toLong)))
    val sd = dim.withColumn(SaltCol, explode(sequence(lit(0L), lit(buckets - 1L))))
    sf.join(sd.hint("shuffle_hash"),
        sf(factKey) === sd(dimKey) && sf(SaltCol) === sd(SaltCol))
      .drop(sf(SaltCol)).drop(sd(SaltCol))
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
