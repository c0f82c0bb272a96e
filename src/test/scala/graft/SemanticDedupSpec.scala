package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Similarity

/** Semantic dedup ([[Similarity.semanticDedup]]): centroid-clustered
  * cosine near-dup removal. Pins the keeper rule, the within-cluster-
  * ONLY comparison (the method's defining approximation), and that
  * centroid seed vectors participate as corpus members. Cluster
  * members sit ~27° off their centroid (cosine ~0.894 to the seed,
  * below every threshold used) so only member-member pairs can drop. */
class SemanticDedupSpec extends AnyFunSuite {
  lazy val spark = Sessions.local(4)
  import spark.implicits._

  private def dedup(rows: Seq[(Long, Seq[Double])], threshold: Double) = {
    val df = rows.toDF("vec_id", "embedding")
    Similarity.semanticDedup(df, df.filter($"vec_id" < 2), "vec_id",
        "embedding", threshold)
      .collect()
      .map(r => r.getAs[Long]("vec_id") ->
        ((r.getAs[Long]("centroid_id"), r.getAs[Boolean]("dropped"))))
      .toMap
  }

  test("near-dup pair in one cluster drops the larger id; keeper survives") {
    val m = dedup(Seq(
      0L -> Seq(1.0, 0.0),    // centroid 0 (also a corpus member)
      1L -> Seq(0.0, 1.0),    // centroid 1
      10L -> Seq(1.0, 0.5),   // cluster 0
      11L -> Seq(0.95, 0.48), // cluster 0, cosine(10,11) ~ 0.99997
      12L -> Seq(0.5, 1.0)),  // cluster 1, alone off-seed
      threshold = 0.93)
    assert(m(10L) == ((0L, false)) && m(11L) == ((0L, true)))
    assert(m(12L) == ((1L, false)))
    assert(m(0L) == ((0L, false)) && m(1L) == ((1L, false)),
      "seed vectors are corpus members and must get (surviving) verdicts")
  }

  test("near-dups split across clusters are NOT compared (the SemDeDup approximation)") {
    // cosine(13,14) ~ 0.994, but 13 -> centroid 0 and 14 -> centroid 1,
    // so neither is dropped — within-cluster only, by construction
    val m = dedup(Seq(
      0L -> Seq(1.0, 0.0),
      1L -> Seq(0.0, 1.0),
      13L -> Seq(1.0, 0.9),
      14L -> Seq(0.9, 1.0)),
      threshold = 0.9)
    assert(m(13L) == ((0L, false)) && m(14L) == ((1L, false)))
  }

  test("a drop chain keeps only the smallest id of a tight cluster") {
    val m = dedup(Seq(
      0L -> Seq(1.0, 0.0),
      1L -> Seq(0.0, 1.0),
      20L -> Seq(1.0, 0.50),
      21L -> Seq(1.0, 0.51),
      22L -> Seq(1.0, 0.52)),
      threshold = 0.99)
    assert(m(20L)._2 == false && m(21L)._2 == true && m(22L)._2 == true)
  }
}
