package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{BatchStore, InvertedIndex}

/** Round-11: the posting store's corpus-stats SIDECAR (BM25 serving no
  * longer scans the store per query — the round-10 verdict's one
  * shipped scale-killer), stats-preserving compaction, and the sharded
  * full-posting export (no single writer task owns a hot token's
  * list).
  */
class Round11Spec extends AnyFunSuite {
  lazy val spark = Sessions.local(4)

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private def rm(root: String): Unit =
    new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sessionState.newHadoopConf())
      .delete(new org.apache.hadoop.fs.Path(root), true)

  // ------------------------------------ posting-store stats sidecar

  test("postingStoreStats: exact totals incl. zero-token docs; the stats read is batch-count-sized") {
    import spark.implicits._
    val root = tmp("graft_stats_sidecar")
    val docs = Seq(
      (1L, "a b c"), (2L, "a b"), (3L, "   "), // doc 3: zero tokens
      (4L, "x y z w"), (5L, "x"))
      .toDF("doc_id", "text")
    InvertedIndex.writePostingStore(
      docs.filter(col("doc_id") <= 3), "doc_id", "text", root, 1L)
    InvertedIndex.writePostingStore(
      docs.filter(col("doc_id") > 3), "doc_id", "text", root, 2L)
    val (stats, m) = Metrics.capture(spark) {
      InvertedIndex.postingStoreStats(spark, root)
        .as[(Long, Long)].collect().head
    }
    assert(stats == ((5L, 10L)),
      s"expected (5 docs, 10 tokens) incl. the zero-token doc, got $stats")
    // THE round-11 pin: corpus stats come from one persisted row per
    // batch — 2 records read, not a store scan (the pre-sidecar path
    // distinct()-scanned every posting row per query)
    assert(m.inputRecords == 2,
      s"stats must read exactly one sidecar row per batch, read ${m.inputRecords}")
    rm(root)
  }

  test("served BM25 reads the term-filtered store + sidecar only — never a stats corpus scan") {
    import spark.implicits._
    val root = tmp("graft_bm25_served")
    // 200 docs, query terms present in a handful
    val docs = (1L to 200L).map { i =>
      val pad = s"filler$i pad${i % 7} noise${i % 13}"
      val t = if (i % 40 == 0) s"spark join hash $pad" else pad
      (i, t)
    }.toDF("doc_id", "text")
    InvertedIndex.writePostingStore(
      docs.filter(col("doc_id") <= 100), "doc_id", "text", root, 1L)
    InvertedIndex.writePostingStore(
      docs.filter(col("doc_id") > 100), "doc_id", "text", root, 2L)
    val storeRows = BatchStore.read(spark, root).count()
    val terms = Seq("spark", "join", "hash")
    val (served, m) = Metrics.capture(spark) {
      InvertedIndex.bm25SearchFromStore(spark, root, "doc_id", terms, k = 10)
        .as[(Long, Long, Double)].collect().toSeq
    }
    val scan = InvertedIndex.bm25Search(docs, "doc_id", "text", terms, k = 10)
      .as[(Long, Long, Double)].collect().toSeq
    assert(served == scan, s"served $served vs scan $scan")
    // tf feeds df and the scoring join (2 term-pruned store passes) +
    // the 2-row sidecar; the old distinct() stats path needed a THIRD,
    // UNPRUNED store pass — reintroducing it breaks this bound
    assert(m.inputRecords <= 2 * storeRows + 8,
      s"served query read ${m.inputRecords} records for a $storeRows-row store " +
        "— a corpus-scale stats scan is back")
    rm(root)
  }

  test("compactPostingStore: search results AND sidecar stats identical; one batch dir each") {
    import spark.implicits._
    val root = tmp("graft_compact_store")
    val docs = Seq((1L, "spark join hash"), (2L, "spark join hash hash"),
      (3L, ""), (4L, "spark join hash spark")).toDF("doc_id", "text")
    InvertedIndex.writePostingStore(
      docs.filter(col("doc_id") <= 2), "doc_id", "text", root, 1L)
    InvertedIndex.writePostingStore(
      docs.filter(col("doc_id") > 2), "doc_id", "text", root, 2L)
    val terms = Seq("spark", "join", "hash")
    def search() = InvertedIndex.bm25SearchFromStore(
      spark, root, "doc_id", terms, k = 10)
      .as[(Long, Long, Double)].collect().toSeq
    def stats() = InvertedIndex.postingStoreStats(spark, root)
      .as[(Long, Long)].collect().head
    val (sBefore, stBefore) = (search(), stats())
    assert(InvertedIndex.compactPostingStore(spark, root, 3L) == 2)
    assert(search() == sBefore, "compaction changed the served ranking")
    assert(stats() == stBefore, "compaction changed the sidecar totals")
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sessionState.newHadoopConf())
    def batchDirs(p: String) = fs.listStatus(new org.apache.hadoop.fs.Path(p))
      .map(_.getPath.getName).filter(_.startsWith("batch=")).sorted.toSeq
    assert(batchDirs(root) == Seq("batch=3"))
    assert(batchDirs(root + "/.stats") == Seq("batch=3"))
    rm(root)
  }

  // ------------------------------------------ sharded posting export

  test("exportPostings: content equals the corpus truth; a hot token's list spans multiple files") {
    import spark.implicits._
    val root = tmp("graft_export_postings")
    // every doc contains the hot token; 60 docs over 16 doc-buckets
    val docs = (1L to 60L).map(i => (i, s"hot unique$i other${i % 5}"))
      .toDF("doc_id", "text")
    InvertedIndex.exportPostings(docs, "doc_id", "text", root,
      batchId = 1L, docBuckets = 16)
    val export = BatchStore.read(spark, root)
    // truth: 60 (hot, doc) postings of tf 1, doc_len 3
    val hot = export.filter(col("token") === "hot")
    assert(hot.count() == 60)
    assert(hot.agg(sum(col("tf"))).head().getLong(0) == 60)
    assert(export.count() == 180)
    // no single owner: the hot token's rows came out of MULTIPLE
    // writer tasks, visible on disk as multiple files (one per task)
    val nFiles = hot.select(input_file_name().as("f")).distinct().count()
    assert(nFiles > 1,
      s"hot token's posting list landed in $nFiles file — single-writer-owned")
    // each (token, doc_bucket) cell stays whole: a cell's rows live in
    // exactly one file, so a reader merges ≤ docBuckets fragments
    val cellFiles = export
      .select(col("token"), col("doc_bucket"), input_file_name().as("f"))
      .groupBy(col("token"), col("doc_bucket"))
      .agg(countDistinct(col("f")).as("nf"))
      .agg(max(col("nf"))).head().getLong(0)
    assert(cellFiles == 1L, s"a (token, doc_bucket) cell split across $cellFiles files")
    rm(root)
  }
}
