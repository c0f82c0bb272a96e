package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.InvertedIndex

/** Round-14: pseudo-relevance feedback — the expansion DIRECTION (a
  * document sharing only the feedback vocabulary must surface even
  * though it matches no original term — the whole point of RM3), the
  * expansion selection order, and the OR semantics of the second
  * pass. Exact fixed-point arithmetic is oracle-gated (q215).
  */
class PrfSpec extends AnyFunSuite {
  lazy val spark = Sessions.local(4)

  private def corpus = {
    import spark.implicits._
    Seq(
      // feedback set: match all three query terms AND carry the
      // co-occurring vocabulary ("shuffle")
      (1L, "spark join hash shuffle alpha"),
      (2L, "spark join hash shuffle beta"),
      (3L, "spark join hash shuffle gamma gamma"),
      // the RM3 target: NO original term, only the feedback vocab
      (4L, "shuffle shuffle delta epsilon"),
      // noise
      (5L, "zeta eta theta iota kappa")
    ).toDF("doc_id", "text")
  }

  test("expansion surfaces a document that matches no original term; AND search cannot") {
    val root = java.nio.file.Files.createTempDirectory("graft_prf").toString
    InvertedIndex.writePostingStore(corpus, "doc_id", "text", root, 1L)
    val terms = Seq("spark", "join", "hash")
    // strict AND: doc 4 is invisible
    val strict = InvertedIndex.bm25SearchFromStore(spark, root,
      "doc_id", terms, 10)
    assert(!strict.collect().map(_.getLong(0)).contains(4L),
      "AND search must not return the term-disjoint doc")
    // PRF: feedback docs 1-3 vote "shuffle" in; doc 4 surfaces —
    // and the call owns exactly one pin (its materialized result)
    // id-set delta, not a count: the ContextCleaner may async-drop a
    // dead pin from an earlier test between captures (count flake)
    def pinnedIds: Set[Int] = spark.sparkContext.getPersistentRDDs.keySet.toSet
    val before = pinnedIds
    val prf = InvertedIndex.prfSearchFromStore(spark, root, corpus,
      "doc_id", "text", terms, fbDocs = 3, fbTerms = 1, k = 10)
    assert((pinnedIds -- before).size == 1,
      "after a PRF call, only the returned frame may be pinned")
    val rows = prf.select(col("doc_id"), col("n_terms_hit"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    // feedback docs rank above the expansion-only doc (they match 4
    // terms, it matches 1)
    val top = prf.orderBy(desc("prf_fp")).select(col("doc_id"))
      .collect().map(_.getLong(0)).toSeq
    graft.operators.Checkpoints.releasePinned(prf)
    assert(rows.contains(4L),
      s"expansion must surface the feedback-vocab doc: $rows")
    assert(rows(4L) == 1L, s"doc 4 hits only the expansion term: $rows")
    assert(!rows.contains(5L), "a doc matching nothing stays invisible")
    assert(top.indexOf(4L) > top.indexOf(1L), s"ranking order: $top")
    new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sessionState.newHadoopConf())
      .delete(new org.apache.hadoop.fs.Path(root), true)
  }

  test("expansion terms select by (count desc, token asc), query terms excluded") {
    import spark.implicits._
    val got = InvertedIndex.prfExpansionTerms(corpus, "doc_id", "text",
        fbIds = Seq(1L, 2L, 3L), terms = Seq("spark", "join", "hash"),
        fbTerms = 2)
      .as[(String, Long)].collect().toSeq
    // counts over docs 1-3: shuffle=3, gamma=2, alpha=1, beta=1;
    // spark/join/hash excluded
    assert(got == Seq(("shuffle", 3L), ("gamma", 2L)), s"got $got")
  }
}
