package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Similarity
import graft.operators.Similarity.dot

/** Diagnostic main: recall@5 of the PQ / IVF-PQ retrieval paths vs the
  * exact squared-L2 brute force, per training-iteration count — the
  * measurement behind the q146/q148 recall floors and the SCALE.md
  * seed-vs-trained comparison row. Prints one line per
  * (path, iters): min/mean recall hits over the 10 gate queries.
  *
  * Usage: runMain graft.RecallProbe <sfDir> [maxIters]
  */
object RecallProbe {

  /** n_hits per query of `adc` (query_id, neighbor_id ranks) against
    * the exact fixed-point squared-L2 top-5 of `e`. */
  private def hits(e: DataFrame, queries: DataFrame, adc: DataFrame): Map[Long, Long] = {
    val qv = queries.select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    val exact = e.select(col("vec_id").as("neighbor_id"), col("embedding").as("xv"))
      .crossJoin(broadcast(qv))
      .withColumn("dfp", floor(
        (dot(col("xv"), col("xv")) - lit(2.0) * dot(col("xv"), col("qv"))
          + dot(col("qv"), col("qv"))) * lit(1073741824.0)).cast("long"))
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("query_id"))
          .orderBy(col("dfp"), col("neighbor_id"))))
      .filter(col("rn") <= 5)
      .select(col("query_id"), col("neighbor_id"), lit(1L).as("hit"))
    adc.select(col("query_id"), col("neighbor_id"))
      .join(exact, Seq("query_id", "neighbor_id"), "left")
      .groupBy(col("query_id"))
      .agg(sum(coalesce(col("hit"), lit(0L))).as("n_hits"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  private def report(tag: String, m: Map[Long, Long]): Unit = {
    val vs = m.values.toSeq
    println(f"[recall] $tag%-28s min=${vs.min} mean=${vs.sum.toDouble / vs.size}%.2f per-query=${m.toSeq.sortBy(_._1).map(_._2).mkString(",")}")
  }

  /** Cluster-mate hits@5 per query: of the 5 returned neighbors, how
    * many share the query's `label` — the retrieval-quality metric
    * that BINDS on planted-cluster fixtures (exact-top-5 overlap
    * measures within-cluster ordering, which quantization erases by
    * design: mates code identically and tie-rank by id). */
  private def mateHits(e: DataFrame, adc: DataFrame): Map[Long, Long] = {
    val lbl = e.select(col("vec_id"), col("label"))
    adc.select(col("query_id"), col("neighbor_id"))
      .join(lbl.select(col("vec_id").as("query_id"), col("label").as("ql")), "query_id")
      .join(lbl.select(col("vec_id").as("neighbor_id"), col("label").as("nl")), "neighbor_id")
      .groupBy(col("query_id"))
      .agg(sum(when(col("ql") === col("nl"), 1L).otherwise(0L)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val maxIters = args.lift(1).map(_.toInt).getOrElse(3)
    val spark: SparkSession = Sessions.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt)
    // "planted:<clusters>x<per>[@noise]" generates the fixture inline
    val e = (if (sfDir.startsWith("planted:")) {
      val spec = sfDir.stripPrefix("planted:")
      val noise = spec.split("@").lift(1).map(_.toDouble).getOrElse(0.3)
      val Array(c, p) = spec.split("@")(0).split("x").map(_.toInt)
      ScaleGen.plantedEmbeddings(spark, c, p, 64, noise)
    } else Tables.embeddings(spark, sfDir)).localCheckpoint()
    val queries = e.filter(col("vec_id") < 10)
    val seeds = e.filter(col("vec_id") < sys.env.getOrElse("PROBE_CODES", "8").toInt)
    val coarse = e.filter(col("vec_id") < 8)
    val resCodes = sys.env.getOrElse("PROBE_RES_CODES", "8").toInt
    val resSeeds = e.filter(col("vec_id") >= 8 && col("vec_id") < 8 + resCodes)
    (0 to maxIters).foreach { it =>
      val cb = Similarity.pqTrainedCodebook(e, seeds, "vec_id", "embedding",
        dim = 64, m = 4, iters = it)
      val adc = Similarity.pqAdcTopK(e, queries, cb, "vec_id", "embedding",
        dim = 64, m = 4, k = 5)
      // mean quantization distortion (sum over subspaces of the
      // assigned centroid's d2) — the quantity Lloyd minimizes
      val dist = Similarity.pqDistortion(e, cb, "vec_id", "embedding",
        dim = 64, m = 4)
      report(f"pq m=4 iters=$it dist=$dist%.4f", hits(e, queries, adc))
      report(f"pq-mates m=4 iters=$it", mateHits(e, adc))
    }
    val nProbe = sys.env.getOrElse("PROBE_NPROBE", "2").toInt
    (0 to maxIters).foreach { it =>
      val adc = Similarity.ivfPqTopK(e, queries, coarse, resSeeds,
        "vec_id", "embedding", dim = 64, m = 4, nProbe = nProbe, k = 5, trainIters = it)
        .localCheckpoint()
      report(s"ivfpq m=4 np=$nProbe iters=$it", hits(e, queries, adc))
      if (e.columns.contains("label"))
        report(s"ivfpq-mates np=$nProbe iters=$it", mateHits(e, adc))
    }
    spark.stop()
  }
}
