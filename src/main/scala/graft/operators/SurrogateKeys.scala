package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Surrogate-key generation + attachment — SURVEY.md §2.5 A1 / §2.4 J1.
  *
  * The reference derives surrogate keys from the positional index of an
  * implicitly-ordered pandas frame (`python/transform.py:52-54`,
  * `python/scd_implementation.py:96-98`). Spark has no row order, so we
  * define the key as `row_number() - 1` over an EXPLICIT deterministic
  * ordering on the natural key — strictly more defined than the
  * reference (SURVEY.md §7.3 "surrogate-key determinism").
  *
  * Scale notes (100 TB design point):
  *  - Sequential keys require a total order; Spark plans a global sort,
  *    but the input here is always the DISTINCT natural-key set of a
  *    dimension (10⁴–10⁷ rows after dedup), never a fact table, so the
  *    single-stage sort is cheap and bounded by dimension cardinality.
  *  - For billion-row dimensions prefer [[stableHashKey]]: a collision-
  *    checked 64-bit hash, fully parallel, no sort, stable across runs
  *    (sequential keys are NOT stable across runs — the reference
  *    re-keys every run and rebuilds facts, SURVEY.md §2.10).
  *  - Attachment is a plain equi join; Spark auto-broadcasts dimension
  *    key maps below the broadcast threshold, so fact-side attachment
  *    is a broadcast hash join with no shuffle of the fact table.
  */
object SurrogateKeys {

  /** Distinct natural keys → dense sequential sk starting at 0,
    * ordered by the natural key columns (deterministic). */
  def surrogateKeys(df: DataFrame, naturalKey: Seq[String], skName: String): DataFrame = {
    val keys = df.select(naturalKey.map(col): _*).na.drop().distinct()
    val w = Window.orderBy(naturalKey.map(col): _*)
    keys.withColumn(skName, row_number().over(w).cast("long") - 1)
  }

  /** Same, but ordered by explicit columns (e.g. dim_date ordered by the
    * date itself, `python/dimensional_modeling.py:39-40`). */
  def surrogateKeysOrdered(df: DataFrame, naturalKey: Seq[String],
      skName: String, orderBy: Seq[Column]): DataFrame = {
    val keys = df.select(naturalKey.map(col): _*).na.drop().distinct()
    keys.withColumn(skName, row_number().over(Window.orderBy(orderBy: _*)).cast("long") - 1)
  }

  /** Scale-path alternative: stable 64-bit hash key of the natural key.
    * No global sort, no shuffle beyond the distinct; stable across runs. */
  def stableHashKey(df: DataFrame, naturalKey: Seq[String], skName: String): DataFrame =
    df.select(naturalKey.map(col): _*).na.drop().distinct()
      .withColumn(skName, xxhash64(naturalKey.map(col): _*))

  /** J1 — attach a surrogate key by left join on the natural key.
    * Key maps are dimension-sized → explicitly broadcast so the fact
    * side never shuffles. */
  def attach(fact: DataFrame, skTable: DataFrame, naturalKey: Seq[String]): DataFrame =
    fact.join(broadcast(skTable), naturalKey, "left")
}
