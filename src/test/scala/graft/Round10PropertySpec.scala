package graft

import scala.util.Random

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Dedup, Similarity, TextAnalysis, Tokenizer}

/** Seeded randomized invariants for the round-10 operators:
  * containment dominates Jaccard on every surfaced pair, BPE
  * training/segmentation conserve counts on arbitrary corpora, MMR
  * picks are distinct with relevance-argmax first, n-gram repetition
  * fractions live in [0, 1] and agree with the naive computation,
  * and the derived RP-LSH bit budget is monotone in the corpus.
  */
class Round10PropertySpec extends AnyFunSuite {
  lazy val spark = Sessions.local(4)

  private val vocab = Vector("alpha", "beta", "gamma", "delta", "epsilon",
    "zeta", "eta", "theta", "Ω", "ü", "名", "x1", "2y", "z_3")

  private def randText(rnd: Random): String =
    Seq.fill(1 + rnd.nextInt(40))(vocab(rnd.nextInt(vocab.size))).mkString(" ")

  test("containment_a/b >= jaccard on every pair both operators surface") {
    import spark.implicits._
    for (seed <- 1 to 3) {
      val rnd = new Random(seed)
      // seed near-dups: pairs share a long prefix
      val docs = (0 until 40).map { i =>
        val base = randText(rnd)
        (i.toLong, if (i % 3 == 0) base + " " + randText(rnd) else base)
      }.toDF("doc_id", "text")
      val jac = Dedup.minhashLshPairs(docs, "doc_id", "text", 16, 3, 8, 0.0)
        .as[(Long, Long, Double)].collect()
        .map { case (a, b, j) => (a, b) -> j }.toMap
      val cont = Dedup.containmentPairs(docs, "doc_id", "text", 16, 3, 8, 0.01)
        .as[(Long, Long, Double, Double)].collect()
      assert(cont.nonEmpty, s"seed=$seed produced no pairs — vacuous")
      cont.foreach { case (a, b, ca, cb) =>
        val j = jac((a, b)) // same candidates: every containment pair has a Jaccard
        assert(ca >= j - 1e-12 && cb >= j - 1e-12,
          s"seed=$seed pair ($a,$b): containment ($ca,$cb) < jaccard $j")
      }
    }
  }

  test("bpeSegmentStats conserves counts on arbitrary corpora") {
    import spark.implicits._
    for (seed <- 1 to 3) {
      val rnd = new Random(seed)
      val docs = (0 until 30).map(i => (i.toLong, randText(rnd)))
        .toDF("doc_id", "text")
      val words = docs
        .select(explode(split(trim(col("text")), "\\s+")).as("w"))
        .filter(col("w") =!= "")
      val (nWords, nChars) = (words.count(),
        words.select(sum(length(col("w")).cast("long"))).head().getLong(0))
      val r = Tokenizer.bpeSegmentStats(docs, "text", Seq.empty, nMerges = 4)
        .collect().head
      assert(r.getLong(0) == nWords, s"seed=$seed word occurrences")
      assert(r.getLong(1) == nChars, s"seed=$seed chars conserved")
      // tokens bounded by chars (no merge splits) and by words (merges
      // only ever shrink a word's symbol count from its char count)
      assert(r.getLong(2) <= nChars && r.getLong(2) >= nWords,
        s"seed=$seed tokens ${r.getLong(2)} outside [$nWords, $nChars]")
    }
  }

  test("mmrRerank: picks distinct per query, pick 1 is the relevance argmax, k bounded") {
    import spark.implicits._
    for (seed <- 1 to 3) {
      val rnd = new Random(seed)
      val cands = (for {
        q <- 0 until 4
        c <- 0 until (3 + rnd.nextInt(8))
      } yield (q.toLong, s"c$c", rnd.nextDouble(),
        Array.fill(6)(rnd.nextFloat() * 2 - 1)))
        .toDF("query_id", "cid", "rel", "emb")
      val picks = Similarity
        .mmrRerank(cands, "query_id", "cid", "rel", "emb", k = 5)
        .as[(Long, Int, String, Double, Double)].collect()
      picks.groupBy(_._1).foreach { case (q, ps) =>
        assert(ps.map(_._3).distinct.length == ps.length,
          s"seed=$seed query $q picked a candidate twice")
        assert(ps.length <= 5)
        val nCands = cands.filter(col("query_id") === q).count()
        assert(ps.length == math.min(5L, nCands),
          s"seed=$seed query $q picked ${ps.length} of $nCands")
        val top = cands.filter(col("query_id") === q)
          .orderBy(col("rel").desc, col("cid"))
          .select("cid").as[String].head()
        assert(ps.minBy(_._2)._3 == top,
          s"seed=$seed query $q: first pick must be the relevance argmax")
      }
    }
  }

  test("ngramRepetition fractions in [0,1]; dup + distinct identity holds") {
    import spark.implicits._
    for (seed <- 1 to 3) {
      val rnd = new Random(seed)
      val docs = (0 until 60).map(i => (i.toLong, randText(rnd)))
        .toDF("doc_id", "text")
      val bad = TextAnalysis.ngramRepetition(docs, "doc_id", "text", n = 2)
        .filter(col("n_grams") > 0)
        .filter(col("dup_gram_frac") < 0 || col("dup_gram_frac") > 1 ||
          col("top_gram_frac") <= 0 || col("top_gram_frac") > 1 ||
          abs(col("n_distinct_grams") + (col("dup_gram_frac") * col("n_grams"))
            - col("n_grams")) > 1e-9)
        .count()
      assert(bad == 0, s"seed=$seed")
    }
  }

  test("derivedRpBits is monotone non-decreasing in corpus size") {
    val ns = Seq(1L, 10L, 100L, 1000L, 50000L, 500000L, 5000000L, 1L << 40)
    val bits = ns.map(Similarity.derivedRpBits)
    assert(bits == bits.sorted, s"$bits not monotone")
    assert(bits.forall(b => b >= 8 && b <= 24))
  }
}
