package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scale-shape data generator: writes an N×-scaled copy of a testdata
  * directory by unioning key-shifted copies of every fact-like table
  * (dims `region`/`nation` stay fixed, like TPC-H scale factors do).
  * Used for the SCALE.md experiment — verifying the headline queries
  * grow ~linearly in rows rather than super-linearly (shuffle blowup,
  * pair explosion) when the data is 10× bigger.
  *
  * Each copy `i` shifts every key column by `i * 100_000_000` — joins
  * and groupings keep their per-key cardinalities while key-space
  * cardinality scales with the data, exactly how a bigger corpus
  * behaves. `documents.text` is additionally passed through a per-copy
  * character rotation (10 distinct mappings) so copies do NOT become
  * cross-copy near-duplicates: without it, every doc would gain 9 LSH
  * twins and the near-dup pair count would grow quadratically in copies
  * — a data-distribution change, not a plan-scale measurement.
  * `embeddings.embedding` gets the vector-space analog for the same
  * reason (a verbatim copy gives every vector copies−1 cos=1.0 clones):
  * a per-copy ORTHOGONAL transform — circular dimension shift by i·7
  * plus (i,j)-derived Rademacher sign flips — preserves every
  * intra-copy inner product and norm exactly (intra-copy structure
  * replicates) while same-vector cross-copy cosines drop to noise.
  * Note the testdata embeddings contain NO planted near-dup clusters
  * (max pairwise cosine ≈ 0.60), so q91's above-threshold pair count
  * is continuum noise and still grows with the PAIR population (~N²)
  * after decorrelation — 4,010 pairs at sf0.1 → ~414k at 10× — which
  * is a property of this synthetic distribution, not of the plan;
  * SCALE.md reads the time-vs-output ratio instead for that query.
  *
  * Usage: runMain graft.ScaleGen <srcDir> <destDir> <copies> [tables]
  * `tables` (comma-separated, optional) restricts the copy to the
  * named tables — a 100× documents-only corpus for a single-query
  * spot-check doesn't need 100× lineitem written alongside it.
  */
object ScaleGen {

  /** Embedding fixture WITH planted near-neighbor structure: `clusters`
    * cluster centers, `perCluster` members each, every member =
    * center + `noise`·perturbation — so each vector has genuine
    * high-cosine neighbors (its cluster mates) and recall floors
    * actually BIND, unlike the driver testdata whose max pairwise
    * cosine ≈ 0.60 makes every top-k a ranking of continuum noise
    * (SCALE.md's q91 note). All "randomness" is the md5-derived
    * uniform of [[graft.operators.Similarity.rpSignatures]]'s plane
    * rule — a pure function of (cluster|row, dim), so the fixture is
    * bit-reproducible on any engine with no RNG state, and generation
    * is one map-side pass (scales to any size, no driver loop).
    *
    * Columns match the testdata `embeddings` table: (vec_id, label,
    * embedding float array); `label` = the true cluster — the
    * ground-truth a recall/clustering spec can score against. */
  def plantedEmbeddings(spark: org.apache.spark.sql.SparkSession,
      clusters: Int, perCluster: Int, dim: Int, noise: Double): DataFrame = {
    require(clusters >= 1 && perCluster >= 1 && dim >= 1,
      s"need positive clusters/perCluster/dim, got $clusters/$perCluster/$dim")
    import graft.operators.TextFunctions.hash60
    // md5-derived uniform in [-1, 1): hash60 is a 60-bit non-negative
    // integer, exactly representable in double
    def u(key: Column): Column =
      hash60(key).cast("double") / lit((1L << 59).toDouble) - lit(1.0)
    spark.range(clusters.toLong * perCluster).select(
      col("id").as("vec_id"),
      (col("id") % clusters).cast("int").as("label"),
      transform(sequence(lit(0), lit(dim - 1)), j => {
        val center = u(concat_ws(":", lit("pc"), col("id") % clusters, j))
        val jitter = u(concat_ws(":", lit("pn"), col("id"), j))
        (center + lit(noise) * jitter).cast("float")
      }).as("embedding"))
  }

  private val keyCols: Map[String, Seq[String]] = Map(
    "customer"   -> Seq("c_custkey"),
    "supplier"   -> Seq("s_suppkey"),
    "part"       -> Seq("p_partkey"),
    "orders"     -> Seq("o_orderkey", "o_custkey"),
    "lineitem"   -> Seq("l_orderkey", "l_partkey", "l_suppkey"),
    "events"     -> Seq("event_id", "user_id"),
    "documents"  -> Seq("doc_id"),
    "embeddings" -> Seq("vec_id"))

  private val rotAlphabet = "aeiousnrtl"
  // second, DISJOINT rotation alphabet: copy i rotates rotAlphabet by
  // i%10 and rotAlphabet2 by (i/10)%10 — 100 distinct composed
  // mappings, so 100× runs keep the no-cross-copy-near-dup guarantee
  // the single 10-char alphabet could only give 10 copies
  private val rotAlphabet2 = "cdhmpgbfwy"

  private def mutate(table: String, df: DataFrame, i: Int): DataFrame = {
    val shifted = keyCols(table).foldLeft(df) { (d, k) =>
      d.withColumn(k, (col(k) + lit(i * 100000000L)).cast(d.schema(k).dataType))
    }
    def rot(a: String, by: Int) = a.drop(by % a.length) + a.take(by % a.length)
    if (table == "documents" && i > 0)
      shifted.withColumn("text",
        translate(
          translate(col("text"), rotAlphabet, rot(rotAlphabet, i % 10)),
          rotAlphabet2, rot(rotAlphabet2, (i / 10) % 10)))
    else if (table == "embeddings" && i > 0) {
      // orthogonal decorrelation: out[j] = ±emb[(j + 7i) mod d] with
      // (i,j)-derived signs — same transform for every row of copy i,
      // so intra-copy inner products/norms are EXACTLY preserved while
      // cross-copy cosines drop to noise
      val elemT = df.schema("embedding").dataType
        .asInstanceOf[org.apache.spark.sql.types.ArrayType].elementType
      val d = size(col("embedding"))
      shifted.withColumn("embedding",
        transform(sequence(lit(0), d - 1), j => {
          val src = element_at(col("embedding"), pmod(j + lit(i * 7), d) + 1)
          val sign = when(pmod(hash(j, lit(i)), lit(2)) === 0, lit(1.0))
            .otherwise(lit(-1.0))
          (src * sign).cast(elemT)
        }))
    }
    else shifted
  }

  def main(args: Array[String]): Unit = {
    // planted-fixture mode: runMain graft.ScaleGen planted <dest>
    //   <clusters> <perCluster> [dim=64] [noise=0.3]
    if (args(0) == "planted") {
      val dest = args(1)
      val (clusters, per) = (args(2).toInt, args(3).toInt)
      val dim = args.lift(4).map(_.toInt).getOrElse(64)
      val noise = args.lift(5).map(_.toDouble).getOrElse(0.3)
      val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt)
      plantedEmbeddings(spark, clusters, per, dim, noise)
        .write.mode("overwrite").parquet(s"$dest/embeddings.parquet")
      println(s"[scalegen] planted embeddings: ${clusters.toLong * per} rows " +
        s"($clusters clusters x $per, dim=$dim, noise=$noise)")
      spark.stop()
      return
    }
    val (src, dest, copies) = (args(0), args(1), args(2).toInt)
    // one distinct composed rotation per copy: past 100 the mapping
    // repeats, copies i and i+100 get byte-identical text, and the
    // cross-copy near-dup explosion this generator exists to prevent
    // comes back silently
    require(copies >= 1 && copies <= 100,
      s"copies=$copies out of range 1..100 (distinct text rotations)")
    val only = args.lift(3).map(_.split(",").toSet)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt
    val spark = Sessions.local(cpus)
    Tables.names.filter(t => only.forall(_.contains(t))).foreach { t =>
      val base = spark.read.parquet(s"$src/$t.parquet")
      val out =
        if (!keyCols.contains(t)) base
        else (0 until copies).map(i => mutate(t, base, i)).reduce(_.unionByName(_))
      out.write.mode("overwrite").parquet(s"$dest/$t.parquet")
      println(s"[scalegen] $t: ${spark.read.parquet(s"$dest/$t.parquet").count()} rows")
    }
    spark.stop()
  }
}
