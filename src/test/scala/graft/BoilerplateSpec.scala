package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Boilerplate

/** Round-14: per-domain repeated-line removal (the CCNet/RefinedWeb
  * first stage) — threshold semantics, domain isolation, order
  * preservation, the drop-empty rule, and the no-regroup plan shape.
  * Exact rebuild arithmetic is oracle-gated (q209).
  */
class BoilerplateSpec extends AnyFunSuite {
  lazy val spark = Sessions.local(4)

  private def fixture = {
    import spark.implicits._
    Seq(
      // domain a: "NAV" in all 3 docs (df=3), "COOKIE" in 2 (df=2)
      (1L, "a", "NAV\nalpha one\nCOOKIE"),
      (2L, "a", "NAV\nbeta two"),
      (3L, "a", "NAV\nCOOKIE\ngamma three"),
      // domain b: "NAV" appears once — NOT boilerplate here
      (4L, "b", "NAV\ndelta four"),
      // domain b: a doc that is ALL boilerplate once df kicks in
      (5L, "b", "PROMO"),
      (6L, "b", "PROMO\nepsilon six"),
      (7L, "b", "PROMO\nzeta seven")
    ).toDF("doc_id", "domain", "text")
  }

  test("lines at or above minDf strip within their domain only; order preserved; all-boilerplate docs drop") {
    import spark.implicits._
    val got = Boilerplate.stripRepeatedLines(fixture,
        "doc_id", "domain", "text", minDf = 3L)
      .orderBy(col("doc_id"))
      .as[(Long, String, Long, Long, String)].collect().toSeq
    // df(a, NAV)=3 stripped; df(a, COOKIE)=2 kept; df(b, NAV)=1 kept;
    // df(b, PROMO)=3 stripped -> doc 5 strips to empty and DROPS
    assert(got == Seq(
      (1L, "a", 3L, 2L, "alpha one\nCOOKIE"),
      (2L, "a", 2L, 1L, "beta two"),
      (3L, "a", 3L, 2L, "COOKIE\ngamma three"),
      (4L, "b", 2L, 2L, "NAV\ndelta four"),
      (6L, "b", 2L, 1L, "epsilon six"),
      (7L, "b", 2L, 1L, "zeta seven")), s"got $got")
  }

  test("minDf=2 also strips the COOKIE pair; duplicate lines within ONE doc count once toward df") {
    import spark.implicits._
    val df2 = Boilerplate.stripRepeatedLines(fixture,
        "doc_id", "domain", "text", minDf = 2L)
      .orderBy(col("doc_id"))
      .as[(Long, String, Long, Long, String)].collect().toSeq
    assert(df2.find(_._1 == 1L).get._5 == "alpha one", s"got $df2")
    // a doc repeating a line 5 times alone must NOT reach df=2
    val rep = Seq((1L, "x", "SAME\nSAME\nSAME\nSAME\nSAME"),
      (2L, "x", "other text")).toDF("doc_id", "domain", "text")
    val kept = Boilerplate.stripRepeatedLines(rep,
        "doc_id", "domain", "text", minDf = 2L)
      .filter(col("doc_id") === 1L).count()
    assert(kept == 1L, "within-doc repeats must not count as cross-doc df")
  }

  test("plan shape: documents are never exploded-and-regrouped; no products") {
    val out = Boilerplate.stripRepeatedLines(fixture,
      "doc_id", "domain", "text", minDf = 3L)
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"no product joins allowed:\n$plan")
    // the strip side must NOT regroup document CONTENT: the rebuild
    // is an in-row array filter, never a collect_list-and-reassemble
    // (the detection pass's distinct over line-HASHES is fine — rows
    // there are fixed-width, not text)
    assert(!plan.contains("collect_list"),
      s"the rebuild must not collect document lines:\n$plan")
  }

  test("stripping UNLOCKS exact dedup: identical bodies behind distinct footers group only after the strip (the q214 pipeline-order claim)") {
    import spark.implicits._
    // 12 docs in 6 duplicate PAIRS (each body appears twice — below
    // the minDf=5 threshold, so bodies survive), every pair split
    // across the two footer variants (6 each — above threshold, so
    // footers strip): byte-level dedup before stripping sees 12
    // distinct docs; after stripping, the 6 pairs collapse
    val docs = (0L until 12L).map(i =>
      (i, "d", s"body number ${i / 2} here\nfooter-${i % 2} d"))
      .toDF("doc_id", "domain", "text")
    def keepers(df: org.apache.spark.sql.DataFrame): Long =
      graft.operators.Dedup.exactGroups(df, "doc_id", "text")
        .filter(col("doc_id") === col("keeper_id")).count()
    assert(keepers(docs) == 12L, "pre-strip: the footers mask every duplicate")
    val stripped = Boilerplate.stripRepeatedLines(docs,
      "doc_id", "domain", "text", minDf = 5L)
    assert(keepers(stripped) == 6L,
      "post-strip: the 6 duplicate pairs must collapse")
  }

  test("line-df store: erase equals recounting without the erased docs; double-delete fails compaction; sink replay no-ops") {
    import spark.implicits._
    val root = java.nio.file.Files
      .createTempDirectory("graft_linedf_store").toString
    val docs = fixture
    graft.operators.Boilerplate.writeLineDfStore(
      docs.filter(col("doc_id") <= 3), "doc_id", "domain", "text", root, 1L)
    graft.operators.Boilerplate.writeLineDfStore(
      docs.filter(col("doc_id") > 3), "doc_id", "domain", "text", root, 2L)
    // erase doc 1: df(a, NAV) drops 3 -> 2, below minDf=3 — NAV must
    // now SURVIVE in the remaining docs' strip
    graft.operators.Boilerplate.deleteFromLineDfStore(
      docs.filter(col("doc_id") === 1L), "doc_id", "domain", "text", root, 3L)
    val remaining = docs.filter(col("doc_id") =!= 1L)
    def serve() = graft.operators.Boilerplate.stripRepeatedLinesFromStore(
      spark, root, remaining, "doc_id", "domain", "text", minDf = 3L)
    val served = serve().orderBy(col("doc_id"))
      .as[(Long, String, Long, Long, String)].collect().toSeq
    val recount = graft.operators.Boilerplate.stripRepeatedLines(
        remaining, "doc_id", "domain", "text", minDf = 3L)
      .orderBy(col("doc_id"))
      .as[(Long, String, Long, Long, String)].collect().toSeq
    assert(served == recount,
      s"erased store must strip like a recount:\n got $served\n exp $recount")
    assert(served.find(_._1 == 2L).get._5 == "NAV\nbeta two",
      s"NAV fell below the threshold after the erasure: $served")
    // compaction folds; a second delete of the same doc nets negative
    assert(graft.operators.Boilerplate.compactLineDfStore(
      spark, root, "domain", 4L) == 3)
    graft.operators.Boilerplate.deleteFromLineDfStore(
      docs.filter(col("doc_id") === 1L), "doc_id", "domain", "text", root, 5L)
    val e = intercept[Exception] {
      graft.operators.Boilerplate.compactLineDfStore(spark, root, "domain", 6L)
    }
    assert(e.getMessage != null && e.getMessage.contains("negative net count"),
      s"double-delete must fail the compaction: ${e.getMessage}")
    // sink: committed epochs no-op on replay
    val sroot = java.nio.file.Files
      .createTempDirectory("graft_linedf_sink").toString
    val sink = graft.operators.Boilerplate.lineDfStoreSink(
      "doc_id", "domain", "text", sroot)
    sink(docs.filter(col("doc_id") <= 3), 0L)
    def stored() = graft.operators.BatchStore.read(spark, sroot)
      .orderBy(col("batch"), col("domain"), col("__lh")).collect().toSeq
    val s0 = stored()
    sink(docs.filter(col("doc_id") <= 3), 0L)
    assert(stored() == s0, "epoch replay must be a no-op")
    Seq(root, sroot).foreach { r =>
      new org.apache.hadoop.fs.Path(r)
        .getFileSystem(spark.sessionState.newHadoopConf())
        .delete(new org.apache.hadoop.fs.Path(r), true)
    }
  }

  test("stripMarkup drops tags and keeps words separated") {
    import spark.implicits._
    val got = Seq("a</p><p>b", "no tags", "<div class=\"x\">inner</div>")
      .toDF("t")
      .select(Boilerplate.stripMarkup(col("t")).as("s"))
      .as[String].collect().toSeq
    // each tag becomes one space — adjacent words never fuse
    assert(got == Seq("a  b", "no tags", " inner "), s"got $got")
  }
}
