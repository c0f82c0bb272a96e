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
    val termRows = BatchStore.read(spark, root)
      .filter(col("token").isin(terms: _*)).count()
    val (served, m) = Metrics.capture(spark) {
      InvertedIndex.bm25SearchFromStore(spark, root, "doc_id", terms, k = 10)
        .as[(Long, Long, Double)].collect().toSeq
    }
    val scan = InvertedIndex.bm25Search(docs, "doc_id", "text", terms, k = 10)
      .as[(Long, Long, Double)].collect().toSeq
    assert(served == scan, s"served $served vs scan $scan")
    // ONE term-pruned store pass (the tf barrier materializes it;
    // its two consumers re-read only the materialized TERM rows —
    // block reads count as inputRecords too) + the 2-row sidecar.
    // The old shape paid 2 full store passes for tf and a third,
    // UNPRUNED one for distinct() stats — either breaks this bound.
    assert(m.inputRecords <= storeRows + 2 * termRows + 8,
      s"served query read ${m.inputRecords} records for a $storeRows-row store " +
        s"($termRows term rows) — a second store pass (or the stats corpus scan) is back")
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

  // ----------------------------- train-once PQ serving (model store)

  test("q146/q148 serve from the model store: a repeated call trains nothing new") {
    import graft.operators.ModelStore
    val sf = "/root/testdata/sf0.001"
    SparkEntry.queries("q146_pq_ann")(spark, sf).collect()
    SparkEntry.queries("q148_ivfpq_ann")(spark, sf).collect()
    val afterFirst = ModelStore.trainedCount
    val r1 = SparkEntry.queries("q146_pq_ann")(spark, sf).collect()
    val r2 = SparkEntry.queries("q148_ivfpq_ann")(spark, sf).collect()
    assert(ModelStore.trainedCount == afterFirst,
      "a second serve must reuse the persisted codebook, not retrain")
    assert(r1.nonEmpty && r2.nonEmpty)
  }

  test("durable model store: a restarted session sharing the root serves the identical artifact without retraining") {
    import spark.implicits._
    import graft.operators.ModelStore
    val root = java.nio.file.Files
      .createTempDirectory("graft_model_store_durable").toString
    var trainRuns = 0
    def train() = { trainRuns += 1
      Seq((0, 1.5), (1, -2.25), (2, 0.0)).toDF("centroid", "v") }
    // session 1 trains and commits
    val first = ModelStore.cachedAt(spark, root, "durable:test:k1")(train())
      .collect().map(r => (r.getInt(0), r.getDouble(1))).sorted.toSeq
    assert(trainRuns == 1)
    // the ONLY state cachedAt consults is the filesystem — a process
    // restart is exactly "a fresh SparkSession against the same root".
    // The fresh session must serve without training.
    val s2 = spark.newSession()
    val second = ModelStore.cachedAt(s2, root, "durable:test:k1")(train())
      .collect().map(r => (r.getInt(0), r.getDouble(1))).sorted.toSeq
    assert(trainRuns == 1, "a session sharing the root must not retrain")
    assert(second == first, "served artifact drifted across sessions")
    // a crashed trainer's leftover dot-staging dir is invisible: it
    // must break neither serving this key nor training a second key
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sessionState.newHadoopConf())
    fs.mkdirs(new org.apache.hadoop.fs.Path(root, ".staging-m-dead-xyz"))
    assert(ModelStore.cachedAt(spark, root, "durable:test:k1")(train())
      .count() == 3)
    assert(trainRuns == 1)
    assert(ModelStore.cachedAt(spark, root, "durable:test:k2")(train())
      .count() == 3)
    assert(trainRuns == 2, "a distinct key must train exactly once")
    rm(root)
  }

  test("pqAdcTopKFromStore: equals the in-memory ADC path; the store scan never reads embeddings") {
    import spark.implicits._
    import graft.operators.Similarity
    val sf = "/root/testdata/sf0.001"
    val e = Tables.embeddings(spark, sf)
    val seeds = e.filter(col("vec_id") < 8)
    val queries = e.filter(col("vec_id") < 10)
    val cb = Similarity.pqTrainedCodebook(e, seeds, "vec_id", "embedding",
      dim = 64, m = 4, iters = 2)
    val root = java.nio.file.Files
      .createTempDirectory("graft_pq_index_spec").toString
    Similarity.writePqIndex(e.filter(col("vec_id") % 2 === 0), cb,
      "vec_id", "embedding", dim = 64, m = 4, root, batchId = 1L)
    Similarity.writePqIndex(e.filter(col("vec_id") % 2 === 1), cb,
      "vec_id", "embedding", dim = 64, m = 4, root, batchId = 2L)
    val served = Similarity.pqAdcTopKFromStore(spark, root, queries, cb,
      "vec_id", "embedding", dim = 64, m = 4, k = 5)
    val inMem = Similarity.pqAdcTopK(e, queries, cb, "vec_id", "embedding",
      dim = 64, m = 4, k = 5)
    assert(served.as[(Long, Long, Long, Long)].collect().toSeq.sorted ==
      inMem.as[(Long, Long, Long, Long)].collect().toSeq.sorted,
      "store-served ADC must equal coding in-memory")
    // the serving point: the CORPUS side of the plan is the code
    // store — its scan's ReadSchema carries (id, sub, code), never
    // the embedding array (queries still read theirs, so check the
    // store relation's line specifically)
    val plan = served.queryExecution.executedPlan.toString
    val readSchemas = plan.linesIterator.filter(_.contains("ReadSchema")).toSeq
    assert(readSchemas.exists(l => l.contains("sub") && l.contains("code") &&
      !l.contains("embedding")),
      s"code-store scan must not read embeddings:\n${readSchemas.mkString("\n")}")
    new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sessionState.newHadoopConf())
      .delete(new org.apache.hadoop.fs.Path(root), true)
  }

  test("ivfPqTopKFromStore: equals the in-memory path; serving scans ONLY the probed lists' partitions") {
    import spark.implicits._
    import graft.operators.Similarity
    val sf = "/root/testdata/sf0.001"
    val e = Tables.embeddings(spark, sf)
    val coarse = e.filter(col("vec_id") < 8)
    val resSeeds = e.filter(col("vec_id") >= 8 && col("vec_id") < 16)
    val queries = e.filter(col("vec_id") < 1) // ONE query: probes ≤ nProbe lists
    val rcb = Similarity.ivfPqResidualCodebook(e, coarse, resSeeds,
      "vec_id", "embedding", dim = 64, m = 4, trainIters = 2)
    val root = java.nio.file.Files
      .createTempDirectory("graft_ivfpq_index_spec").toString
    Similarity.writeIvfPqIndex(e, coarse, rcb,
      "vec_id", "embedding", dim = 64, m = 4, root, batchId = 1L)
    val served = Similarity.ivfPqTopKFromStore(spark, root, queries, coarse,
      rcb, "vec_id", "embedding", dim = 64, m = 4, nProbe = 2, k = 5)
    val inMem = Similarity.ivfPqTopK(e, queries, coarse, resSeeds,
      "vec_id", "embedding", dim = 64, m = 4, nProbe = 2, k = 5,
      trainIters = 2, residualCodebook = Some(rcb))
    assert(served.as[(Long, Long, Long, Long)].collect().toSeq.sorted ==
      inMem.as[(Long, Long, Long, Long)].collect().toSeq.sorted,
      "store-served IVF-PQ must equal the in-memory path")
    // the pruning point: 1 query × nProbe=2 probes at most 2 of the
    // 8 lists — the scan's partition count must be the probed count,
    // not all list dirs
    def scansOf(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[org.apache.spark.sql.execution.FileSourceScanExec] = p.collect {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        scansOf(a.executedPlan)
      case f: org.apache.spark.sql.execution.FileSourceScanExec => Seq(f)
    }.flatten
    val scan = scansOf(served.queryExecution.executedPlan)
      .find(_.metadata.get("Location").exists(_.contains("graft_ivfpq_index_spec")))
    assert(scan.isDefined, "expected a parquet scan of the index store")
    val parts = scan.get.selectedPartitions.partitionCount
    assert(parts <= 2 && parts >= 1,
      s"1 query × nProbe=2 must open at most 2 list partitions, opened $parts")
    new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sessionState.newHadoopConf())
      .delete(new org.apache.hadoop.fs.Path(root), true)
  }

  // ----------------------------- LSH-fronted retrieval (q172 path)

  test("rpLshTopK: no corpus×queries product; finds planted neighbors with exact cosines") {
    import spark.implicits._
    import graft.operators.Similarity
    val dim = 8
    def base(i: Int): Seq[Double] =
      (0 until dim).map(j => (((i * 31 + j * 17) % 13) - 6).toDouble)
    // 5 queries, each with 3 near-identical planted neighbors
    // (cosine ≈ 1 ⇒ per-table collision ≈ (1−θ/π)^bits ≈ 1; missing
    // all 8 tables is ~1e-13) plus unrelated filler
    val queries = (1 to 5).map(i => (i.toLong, base(i)))
    val planted = for {
      i <- 1 to 5; r <- 1 to 3
    } yield ((100 * i + r).toLong, base(i).zipWithIndex.map {
      case (v, j) => v + 0.001 * r * (j % 3) })
    val filler = (1 to 50).map(i => ((1000 + i).toLong, base(i * 7 + 3)))
    val corpus = (planted ++ filler).toDF("id", "v")
    val qdf = queries.toDF("id", "v")
    val lsh = Similarity.rpLshTopK(corpus, qdf, "id", "v",
      dim = dim, bits = 2, tables = 8, k = 3)
    val plan = lsh.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"LSH retrieval must never form the corpus×queries product:\n$plan")
    assert(plan.contains("rp_bucket"), "candidate join must key on the sign bucket")
    val brute = Similarity.bruteForceTopK(corpus, qdf, "id", "v", k = 3)
    val l = lsh.as[(Long, Long, Long, Double)].collect().toSeq.sorted
    val b = brute.as[(Long, Long, Long, Double)].collect().toSeq.sorted
    assert(l == b,
      s"planted neighbors at cosine≈1 must all collide: lsh $l vs brute $b")
    assert(l.map(_._1).distinct.size == 5 && l.size == 15)
  }

  // ----------------------------- true-greedy BPE merge application

  test("bpeTrain pairs even same-symbol runs greedily: 'aaaa' -> [aa, aa], not [aa, a, a]") {
    import spark.implicits._
    import graft.operators.Tokenizer
    // the round-10 advice counterexample: a literal replace of
    // ␟a␟a␟ consumes the shared boundary separator, leaving
    // [aa, a, a] for 'aaaa'; Sennrich's greedy scan pairs [aa, aa].
    // Trajectory under the fold: round 1 merges (a,a) (3 overlapping
    // pairs × 2 words = 6), leaving both words as [aa, aa]; round 2
    // merges (aa,aa) (count 2); then exhaustion.
    val docs = Seq((1L, "aaaa aaaa")).toDF("doc_id", "text")
    val merges = Tokenizer.bpeTrain(docs, "text", nMerges = 5)
      .as[(Int, String, String, Long)].collect().toSeq
    assert(merges == Seq((1, "a", "a", 6L), (2, "aa", "aa", 2L)),
      merges.toString)
    // the replace-based application would have left [aa, a, a] after
    // round 1, making round 2's argmax (aa, a) — the segmentation
    // stats expose the same difference: 1 token per word, not 2/3
    val seg = Tokenizer.bpeSegmentStats(docs, "text", Seq.empty, nMerges = 2)
      .collect().head
    assert(seg.getLong(0) == 2L && seg.getLong(2) == 2L,
      s"2 words, 1 BPE token each after both merges, got ${seg.toSeq}")
  }

  test("applyMerge separator guard: a symbol suffixed by s1 never false-matches") {
    import spark.implicits._
    import graft.operators.Tokenizer
    // words 'xab' and 'ab': round 1 argmax is (a,b) count 2; 'xab'
    // must merge its OWN (a,b) — and the 'x' symbol, whose
    // accumulator suffix is 'x' not '␟a', must not fuse
    val docs = Seq((1L, "xab ab")).toDF("doc_id", "text")
    val merges = Tokenizer.bpeTrain(docs, "text", nMerges = 1)
      .as[(Int, String, String, Long)].collect().toSeq
    assert(merges == Seq((1, "a", "b", 2L)), merges.toString)
    val seg = Tokenizer.bpeSegmentStats(docs, "text", Seq.empty, nMerges = 1)
      .collect().head
    // 'xab' -> [x, ab] (2), 'ab' -> [ab] (1)
    assert(seg.getLong(2) == 3L, s"expected 3 BPE tokens, got ${seg.toSeq}")
  }

  test("bpeTrainBatched: batch=1 is bit-identical to bpeTrain; batch=2 halves rounds and skips conflicts") {
    import spark.implicits._
    import graft.operators.Tokenizer
    val docs = Seq((1L, "banana bandana banana"), (2L, "ban cabana"))
      .toDF("doc_id", "text")
    val single = Tokenizer.bpeTrain(docs, "text", nMerges = 4)
      .as[(Int, String, String, Long)].collect().toSeq
    val b1 = Tokenizer.bpeTrainBatched(docs, "text", nMerges = 4, batch = 1)
      .as[(Int, Int, String, String, Long)].collect().toSeq
    assert(b1.map { case (r, _, s1, s2, c) => (r, s1, s2, c) } == single,
      s"batch=1 must replay the q157 trajectory exactly: $b1 vs $single")
    assert(b1.map(_._2) == (1 to 4), "batch=1: one round per merge")
    val b2 = Tokenizer.bpeTrainBatched(docs, "text", nMerges = 4, batch = 2)
      .as[(Int, Int, String, String, Long)].collect().toSeq
    assert(b2.map(_._2) == Seq(1, 1, 2, 2), s"batch=2: two merges per round: $b2")
    // within a round the two selections must be non-conflicting
    b2.groupBy(_._2).values.foreach {
      case Seq((_, _, a1, a2, _), (_, _, p1, p2, _)) =>
        assert(p1 != a2 && p2 != a1 && (p1, p2) != ((a1, a2)),
          s"conflicting pair batched together: ($a1,$a2) + ($p1,$p2)")
      case other => fail(s"expected 2 selections per round, got $other")
    }
  }

  test("postingStoreSink: epoch replay is a no-op; the postings-without-stats crash window heals") {
    import spark.implicits._
    val root = tmp("graft_sink_replay")
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val b0 = Seq((1L, "a b c"), (2L, "a")).toDF("doc_id", "text")
    val b1 = Seq((3L, "b c"), (4L, "   ")).toDF("doc_id", "text")
    val sink = InvertedIndex.postingStoreSink("doc_id", "text", root)
    sink(b0, 0L); sink(b1, 1L)
    def stats() = InvertedIndex.postingStoreStats(spark, root)
      .as[(Long, Long)].collect().head
    def postings() = BatchStore.read(spark, root).count()
    val (s0, p0) = (stats(), postings())
    assert(s0 == ((4L, 6L)), s"zero-token doc 4 must count in stats: $s0")
    // at-least-once delivery: replaying both epochs changes NOTHING
    sink(b0, 0L); sink(b1, 1L)
    assert(stats() == s0 && postings() == p0, "replay must be a no-op")
    // crash window: postings committed, stats not — replay heals
    fs.delete(new org.apache.hadoop.fs.Path(root, ".stats/batch=2"), true)
    assert(stats() == ((2L, 4L)), "sanity: stats under-count in the window")
    sink(b1, 1L)
    assert(stats() == s0 && postings() == p0,
      "replaying the crashed epoch must append exactly the missing stats row")
    rm(root)
  }

  test("bpeApplyStats: frozen merges replayed on the training corpus equal the trainer's own segmentation") {
    import spark.implicits._
    import graft.operators.Tokenizer
    val docs = Seq((1L, "banana bandana aaaa"), (2L, "ban ab aaaa"))
      .toDF("doc_id", "text")
    val merges = Tokenizer.bpeTrain(docs, "text", nMerges = 4)
      .orderBy(col("merge_rank"))
      .collect().toSeq.map(r => (r.getString(1), r.getString(2)))
    val trainSide = Tokenizer.bpeSegmentStats(docs, "text", Seq.empty, nMerges = 4)
      .collect().head.toSeq
    val applySide = Tokenizer.bpeApplyStats(docs, "text", Seq.empty, merges)
      .collect().head.toSeq
    // the trainer's final vocab IS sequential application of the
    // learned merges in rank order — post-hoc replay must agree
    assert(applySide == trainSide, s"$applySide vs $trainSide")
    // unseen words segment with whatever merges apply; others no-op
    val unseen = Seq((9L, "banana zzz aaaa")).toDF("doc_id", "text")
    val u = Tokenizer.bpeApplyStats(unseen, "text", Seq.empty, merges)
      .collect().head
    assert(u.getLong(0) == 3L && u.getLong(2) >= 3L,
      s"3 words, 'zzz' must stay unmerged-or-char-split: ${u.toSeq}")
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

  // ------------------------------------- streamed decontamination

  test("contaminationSink: exactly-once under epoch replay; flags independent of chunking") {
    import spark.implicits._
    val docs = (1L to 40L).map { i =>
      val t = if (i % 5 == 0) s"alpha beta gamma tail$i"
        else s"tok$i tok${i + 1} tok${i + 2} tok${i + 3}"
      (i, t)
    }.toDF("doc_id", "text")
    val eval = Seq((900L, "alpha beta gamma")).toDF("doc_id", "text")
    val train = docs
    val expect = graft.operators.Decontaminate
      .flagContaminated(train, eval, "doc_id", "text", n = 3)
      .select(col("doc_id"), col("is_contaminated"))
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    // chunking A: two epochs, with epoch 0 REPLAYED after commit
    val rootA = tmp("graft_decon_a")
    val sinkA = graft.operators.Decontaminate.contaminationSink(
      eval, "doc_id", "text", n = 3, rootA, keep = Seq("doc_id"))
    sinkA(train.filter(col("doc_id") <= 20), 0L)
    sinkA(train.filter(col("doc_id") > 20), 1L)
    sinkA(train.filter(col("doc_id") <= 20), 0L) // at-least-once replay
    // chunking B: one epoch
    val rootB = tmp("graft_decon_b")
    val sinkB = graft.operators.Decontaminate.contaminationSink(
      eval, "doc_id", "text", n = 3, rootB, keep = Seq("doc_id"))
    sinkB(train, 0L)
    for (root <- Seq(rootA, rootB)) {
      val got = BatchStore.read(spark, root)
        .select(col("doc_id"), col("is_contaminated"))
        .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
      assert(got == expect,
        s"streamed flags at $root diverge from the batch flagger")
      rm(root)
    }
  }
}
