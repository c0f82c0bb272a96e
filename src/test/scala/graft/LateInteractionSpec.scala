package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{LateInteraction, TextFunctions}

/** Round-13: ColBERT-style MaxSim re-ranking — the signal DIRECTION
  * (a passage containing the query's tokens must outrank a
  * token-disjoint passage), the per-position accounting, duplicate
  * handling on both sides, and the checkpoint lifecycle. The exact
  * fixed-point arithmetic is oracle-gated (q197).
  */
class LateInteractionSpec extends AnyFunSuite {
  lazy val spark = Sessions.local(4)

  test("tokenVector: subword grams give multi-component vectors; equals the explicit gram fold") {
    import spark.implicits._
    val df = Seq(("apple"), ("a"), ("banana")).toDF("tok")
    val got = df.select(col("tok"),
        TextFunctions.tokenVector(col("tok"), 8).as("tv"),
        TextFunctions.hashEmbedGrams(transform(
          sequence(lit(1), length(concat(lit("<"), col("tok"), lit(">"))) - 2),
          i => concat(lit("<"), col("tok"), lit(">")).substr(i, lit(3))), 8)
          .as("ref"))
      .as[(String, Seq[Double], Seq[Double])].collect()
    got.foreach { case (tok, tv, ref) =>
      assert(tv.length == 8 && tv == ref, s"$tok: $tv vs $ref")
    }
    // 'apple' has 5 grams over 8 slots — expect >1 non-zero component
    // with overwhelming probability for this fixed token (pinned)
    val apple = got.find(_._1 == "apple").get._2
    assert(apple.count(_ != 0.0) > 1, s"expected multi-component, got $apple")
  }

  test("a passage containing the query's tokens outranks a token-disjoint passage") {
    import spark.implicits._
    val queries = Seq((1L, "apple banana cherry date")).toDF("query_id", "text")
    val passages = Seq(
      (10L, "apple banana cherry date extra tokens here"),
      (11L, "zzq wqx yyk nnm qqv ppb"),
      (12L, "apple banana unrelated filler words")).toDF("neighbor_id", "text")
    val cands = passages.select(lit(1L).as("query_id"), col("neighbor_id"))
    val res = LateInteraction.maxSimRerank(cands, queries, passages,
      "query_id", "neighbor_id", "text", dim = 16, maxQueryTokens = 16, k = 3)
    val got = res.select(col("rank"), col("neighbor_id"), col("n_qtoks"))
      .as[(Long, Long, Long)].collect().toSeq.sortBy(_._1)
    graft.operators.Checkpoints.releasePinned(res)
    assert(got.map(_._2) == Seq(10L, 12L, 11L),
      s"expected full-match > partial-match > disjoint, got $got")
    // every query position embeds (4 tokens, all non-empty)
    assert(got.forall(_._3 == 4L), s"n_qtoks must be 4 for all pairs: $got")
  }

  test("duplicate query tokens count per position; duplicate passage tokens collapse; k truncates; pins released") {
    import spark.implicits._
    val queries = Seq((1L, "apple apple")).toDF("query_id", "text")
    val passages = Seq(
      (10L, "apple apple apple"),
      (11L, "apple")).toDF("neighbor_id", "text")
    val cands = passages.select(lit(1L).as("query_id"), col("neighbor_id"))
    def pinned: Int = spark.sparkContext.getPersistentRDDs.size
    val before = pinned
    val res = LateInteraction.maxSimRerank(cands, queries, passages,
      "query_id", "neighbor_id", "text", dim = 16, maxQueryTokens = 16, k = 2)
    val got = res.select(col("neighbor_id"), col("n_qtoks"), col("ms_fp"))
      .as[(Long, Long, Long)].collect().toSeq.sortBy(_._1)
    assert(pinned == before + 1,
      "after a call, only the returned frame may be pinned")
    graft.operators.Checkpoints.releasePinned(res)
    assert(pinned == before, "each call must release every internal pin")
    // both positions of the duplicated query token score, and the
    // passage's duplicate occurrences change nothing: both passages
    // offer the same best match per position
    assert(got.map(_._2) == Seq(2L, 2L), s"2 query positions each: $got")
    assert(got(0)._3 == got(1)._3,
      s"passage-side duplicates must not change MaxSim: $got")
    val res1 = LateInteraction.maxSimRerank(cands, queries, passages,
      "query_id", "neighbor_id", "text", dim = 16, maxQueryTokens = 16, k = 1)
    assert(res1.count() == 1L, "k must truncate per query")
    graft.operators.Checkpoints.releasePinned(res1)
  }

  test("maxQueryTokens bounds the scored window") {
    import spark.implicits._
    val queries = Seq((1L, "apple banana cherry")).toDF("query_id", "text")
    val passages = Seq((10L, "apple banana cherry")).toDF("neighbor_id", "text")
    val cands = passages.select(lit(1L).as("query_id"), col("neighbor_id"))
    val res = LateInteraction.maxSimRerank(cands, queries, passages,
      "query_id", "neighbor_id", "text", dim = 16, maxQueryTokens = 2, k = 1)
    val n = res.select(col("n_qtoks")).head.getLong(0)
    graft.operators.Checkpoints.releasePinned(res)
    assert(n == 2L, s"only the first 2 query positions may score, got $n")
  }
}
