package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Embedding quantization — the 4× memory/bandwidth lever for
  * billion-vector ANN: a 100 TB float32 embedding store becomes 25 TB
  * of int8 plus one float scale per vector, and int8 dot products are
  * SIMD-friendly on every executor.
  *
  * Scheme: per-vector absmax. `scale = max |x_i|` and
  * `q_i = floor(x_i · 127 / scale)` (zero vectors quantize to all
  * zeros). Floor — not round-half-even — so the mapping is exact
  * double arithmetic in any IEEE engine: each float widens exactly,
  * the product/quotient are single correctly-rounded ops, and floor is
  * exact, making quantized values bit-identical cross-engine (the
  * property the q75 oracle gate checks). Reconstruction error is
  * bounded by one quantization step: `|x_i − q_i·scale/127| < scale/127`
  * (pinned in QuantizeSpec).
  *
  * Shape: pure map-side array arithmetic — no shuffle, no UDF; the
  * whole pass pipelines inside the parquet scan projection.
  */
object Quantize {

  /** Adds `dim`, `scale`, and the quantized `q` (array<int>, values in
    * [-127, 127]) per row of `vecCol` (array<float> or array<double>). */
  def int8AbsMax(df: DataFrame, vecCol: String): DataFrame = {
    Seq("dim", "scale", "q").foreach(c =>
      require(!df.columns.contains(c), s"int8AbsMax output column '$c' already exists"))
    val v = transform(col(vecCol), x => x.cast("double"))
    df.withColumn("dim", size(col(vecCol)))
      .withColumn("scale", array_max(transform(v, x => abs(x))))
      .withColumn("q",
        when(col("scale") > 0,
          transform(v, x => floor(x * lit(127.0) / col("scale")).cast("int")))
          .otherwise(transform(v, x => lit(0))))
  }

  /** Per-vector quantization summary (the oracle-comparable digest of
    * [[int8AbsMax]]): element sum, min, max, and the count of
    * saturated (|q| = 127) elements. */
  def int8Summary(df: DataFrame, idCol: String, vecCol: String): DataFrame =
    int8AbsMax(df, vecCol).select(
      col(idCol),
      col("dim").cast("long").as("dim"),
      col("scale"),
      aggregate(col("q"), lit(0L), (acc, x) => acc + x).as("q_sum"),
      array_min(col("q")).as("q_min"),
      array_max(col("q")).as("q_max"),
      size(filter(col("q"), x => abs(x) === 127)).cast("long").as("n_sat"))
}
