package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Dedup, Similarity, Sketches}

/** Round-10: signature-store compaction hardening (conflicting content
  * fails loudly; the id invariant is re-validated against appends that
  * race the merge) and derived defaults for sketch/index constants.
  */
class Round10Spec extends AnyFunSuite {
  lazy val spark = Sessions.local(4)

  // ------------------------------- compaction content conflicts

  test("compactSignatureStore: byte-identical re-appends heal; conflicting content fails loudly") {
    import spark.implicits._
    val root = java.nio.file.Files
      .createTempDirectory("graft_compact_conflict").toString
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sessionState.newHadoopConf())

    val d1 = Seq((1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "one two three four five six seven")).toDF("doc_id", "text")
    Dedup.writeSignatureStore(d1, "doc_id", "text", 16, 3, root, batchId = 1L)
    // byte-identical re-append of doc 1: legal, compaction keeps ONE row
    Dedup.writeSignatureStore(d1.filter(col("doc_id") === 1L),
      "doc_id", "text", 16, 3, root, batchId = 2L)
    assert(Dedup.compactSignatureStore(spark, root, "doc_id", 3L) == 2)
    assert(Dedup.readSignatureStore(spark, root).count() == 2)

    // doc 1 re-appended with DIFFERENT text: either chash previously
    // matched the exact-dup stage; an arbitrary-survivor merge would
    // silently change that, so compaction must refuse
    val revised = Seq((1L, "revised text for doc one nothing like before"))
      .toDF("doc_id", "text")
    Dedup.writeSignatureStore(revised, "doc_id", "text", 16, 3, root, batchId = 4L)
    val e = intercept[IllegalArgumentException] {
      Dedup.compactSignatureStore(spark, root, "doc_id", 5L)
    }
    assert(e.getMessage.contains("conflicting content"), e.getMessage)
    assert(e.getMessage.contains("1"), "offending id must be named")
    // the refused compaction left no visible batch and the store intact
    val dirs = fs.listStatus(new org.apache.hadoop.fs.Path(root))
      .map(_.getPath.getName).filter(_.startsWith("batch=")).sorted.toSeq
    assert(dirs == Seq("batch=3", "batch=4"))
    fs.delete(new org.apache.hadoop.fs.Path(root), true)
  }

  test("compactSignatureStore: an append racing the merge with id >= newBatchId aborts before the rename") {
    import spark.implicits._
    val root = java.nio.file.Files
      .createTempDirectory("graft_compact_race").toString
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val d1 = Seq((1L, "alpha beta gamma delta epsilon zeta"))
      .toDF("doc_id", "text")
    Dedup.writeSignatureStore(d1, "doc_id", "text", 16, 3, root, batchId = 1L)
    // simulate the race via the test seam: a batch dir with id >=
    // newBatchId lands after the merge is staged but before the commit
    // rename — the re-list must catch it and abort.
    val e = intercept[IllegalArgumentException] {
      Dedup.compactSignatureStore(spark, root, "doc_id", 5L,
        () => fs.mkdirs(new org.apache.hadoop.fs.Path(root, "batch=9")))
    }
    assert(e.getMessage.contains("raced"), e.getMessage)
    // nothing committed: batch=5 absent, original batch intact
    val dirs = fs.listStatus(new org.apache.hadoop.fs.Path(root))
      .map(_.getPath.getName).filter(_.startsWith("batch=")).sorted.toSeq
    assert(dirs == Seq("batch=1", "batch=9"))
    fs.delete(new org.apache.hadoop.fs.Path(root), true)
  }

  // --------------------- derived sketch/index constants (VERDICT r9 #5)

  test("derivedRpBits: ~2 expected per uniform cell, clamped [8, 24]") {
    // 18 is the constant q131 measured against the degenerate 500k case
    assert(Similarity.derivedRpBits(500000L) == 18)
    assert(Similarity.derivedRpBits(500L) == 8) // ceil(log2 250) = 8
    assert(Similarity.derivedRpBits(5000L) == 12)
    assert(Similarity.derivedRpBits(1L) == 8) // lower clamp
    assert(Similarity.derivedRpBits(Long.MaxValue >> 1) == 24) // upper clamp
  }

  test("rpLshNearDupPairs(bits = 0) is value-identical to the explicit derived budget") {
    import spark.implicits._
    // 40 spread vectors + 3 planted near-dup pairs
    val vecs = ((0L until 40L).map { i =>
      (i, Array((i % 7).toFloat + 1f, (i % 5).toFloat - 2f,
        (i % 3).toFloat, (i % 11).toFloat - 5f))
    } ++ Seq((100L, Array(1f, 2f, 3f, 4f)), (101L, Array(1f, 2f, 3f, 4.01f)),
      (102L, Array(-3f, 1f, 2f, 0.5f)), (103L, Array(-3f, 1f, 2f, 0.51f))))
      .toDF("vec_id", "embedding")
    val n = vecs.count()
    val explicitBits = Similarity
      .rpLshNearDupPairs(vecs, "vec_id", "embedding", dim = 4,
        bits = Similarity.derivedRpBits(n), tables = 4, threshold = 0.99)
      .as[(Long, Long, Double)].collect().toSet
    val derived = Similarity
      .rpLshNearDupPairs(vecs, "vec_id", "embedding", dim = 4,
        bits = 0, tables = 4, threshold = 0.99)
      .as[(Long, Long, Double)].collect().toSet
    assert(derived == explicitBits)
    assert(derived.map { case (a, b, _) => (a, b) }
      .contains((100L, 101L)), "planted near-dup pair must collide")
  }

  test("derivedKmvK / derivedFanout pin the gate constants at gate scale") {
    assert(Sketches.derivedKmvK() == 64, "default 12.5% error = the q141/q145/q149 constant")
    assert(Sketches.derivedKmvK(0.25) == 16)
    assert(Sketches.derivedKmvK(0.1) == 100)
    assert(Sketches.derivedFanout(1000L) == 32, "gate-scale distinct counts keep the constant 32")
    assert(Sketches.derivedFanout(1L << 20) == 32)
    assert(Sketches.derivedFanout((1L << 20) + 1) == 32) // still below 32 cells' worth
    assert(Sketches.derivedFanout(1L << 26) == 64) // 64M rows: 64 cells of <=1M
    assert(Sketches.derivedFanout(1L << 30) == 1024)
  }

  test("kMinValues(k = 0, fanout = 0) equals the explicit (64, 32) gate call") {
    import spark.implicits._
    val df = (0L until 5000L).map(i => (s"s${i % 3}", (i * 2654435761L) % 100000L))
      .toDF("source", "h")
    val explicitCall = Sketches.kMinValues(df, "source", "h", k = 64, fanout = 32)
      .as[(String, Long)].collect().toSet
    val derived = Sketches.kMinValues(df, "source", "h", k = 0, fanout = 0)
      .as[(String, Long)].collect().toSet
    assert(derived == explicitCall)
  }

  test("derivedPqParams: (dim 64, n 500) = the q146/q148 gate constants") {
    assert(Similarity.derivedPqParams(64, 500L) == ((4, 8)),
      "gate scale must derive m=4, 8 centroids — the explicit constants")
    assert(Similarity.derivedPqParams(64, 2000L) == ((4, 32))) // sf0.1
    assert(Similarity.derivedPqParams(32, 500L) == ((2, 8)))
    assert(Similarity.derivedPqParams(24, 100000L) == ((3, 256))) // clamp at 1 byte/code
    assert(Similarity.derivedPqParams(10, 10L) == ((5, 2))) // odd dim, tiny corpus
  }

  // ----------------------------- incremental posting store

  test("posting store: search over appended batches equals the scan path; term filter pushes to the scan; retry fails fast") {
    import spark.implicits._
    import graft.operators.{BatchStore, InvertedIndex}
    val root = java.nio.file.Files
      .createTempDirectory("graft_posting_spec").toString
    val docs = Seq(
      (1L, "spark join hash spark"), (2L, "spark join hash"),
      (3L, "spark only here"), (4L, "join hash but no first term"),
      (5L, "spark join hash hash hash")).toDF("doc_id", "text")
    InvertedIndex.writePostingStore(
      docs.filter(col("doc_id") <= 2), "doc_id", "text", root, 1L)
    InvertedIndex.writePostingStore(
      docs.filter(col("doc_id") > 2), "doc_id", "text", root, 2L)
    val terms = Seq("spark", "join", "hash")
    val fromStore = InvertedIndex.andSearchFromStore(
      BatchStore.read(spark, root), "doc_id", terms, k = 10)
    val fromScan = InvertedIndex.andSearch(docs, "doc_id", "text", terms, k = 10)
      .select(col("doc_id"), col("score"))
    assert(fromStore.as[(Long, Long)].collect().toSeq ==
      fromScan.as[(Long, Long)].collect().toSeq)
    assert(fromStore.as[(Long, Long)].collect().toSeq ==
      Seq((5L, 5L), (1L, 4L), (2L, 3L)))
    // the point of the index: the term filter reaches the parquet scan
    val plan = fromStore.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("In(token"),
      s"term filter must push into the store scan:\n$plan")
    // append-only: re-committing a batch id fails fast
    intercept[IllegalArgumentException] {
      InvertedIndex.writePostingStore(docs, "doc_id", "text", root, 1L)
    }
    new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sessionState.newHadoopConf())
      .delete(new org.apache.hadoop.fs.Path(root), true)
  }

  test("bm25SearchFromStore equals the scan path even with zero-token docs (sidecar stats)") {
    import spark.implicits._
    import graft.operators.InvertedIndex
    val root = java.nio.file.Files
      .createTempDirectory("graft_bm25_store_spec").toString
    // doc 5 tokenizes to NOTHING: it has no postings, but the stats
    // sidecar (computed from the raw batch frame) still counts it in
    // N — exactly like the scan path, so the paths stay identical on
    // any corpus (pre-round-11 the store path diverged here).
    val docs = Seq(
      (1L, "spark join hash spark pad1 pad2"), (2L, "spark join hash"),
      (3L, "spark only"), (4L, "spark join hash " + ("filler " * 30).trim),
      (5L, "   "))
      .toDF("doc_id", "text")
    InvertedIndex.writePostingStore(
      docs.filter(col("doc_id") <= 2), "doc_id", "text", root, 1L)
    InvertedIndex.writePostingStore(
      docs.filter(col("doc_id") > 2), "doc_id", "text", root, 2L)
    val terms = Seq("spark", "join", "hash")
    val scan = InvertedIndex.bm25Search(docs, "doc_id", "text", terms, k = 10)
      .as[(Long, Long, Double)].collect().toSeq
    val store = InvertedIndex.bm25SearchFromStore(
        spark, root, "doc_id", terms, k = 10)
      .as[(Long, Long, Double)].collect().toSeq
    assert(store == scan, s"store $store vs scan $scan")
    assert(store.map(_._1) == Seq(2L, 1L, 4L),
      "short balanced doc must outrank the padded ones")
    new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sessionState.newHadoopConf())
      .delete(new org.apache.hadoop.fs.Path(root), true)
  }

  test("BatchStore.compact: layout-only (search unchanged); racing append aborts before the rename") {
    import spark.implicits._
    import graft.operators.{BatchStore, InvertedIndex}
    val root = java.nio.file.Files
      .createTempDirectory("graft_batchstore_compact").toString
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val docs = Seq((1L, "spark join hash"), (2L, "spark join hash hash"),
      (3L, "spark join hash spark spark")).toDF("doc_id", "text")
    InvertedIndex.writePostingStore(
      docs.filter(col("doc_id") <= 1), "doc_id", "text", root, 1L)
    InvertedIndex.writePostingStore(
      docs.filter(col("doc_id") > 1), "doc_id", "text", root, 2L)
    val terms = Seq("spark", "join", "hash")
    def search() = InvertedIndex.andSearchFromStore(
        BatchStore.read(spark, root), "doc_id", terms, k = 10)
      .as[(Long, Long)].collect().toSeq
    val before = search()
    assert(BatchStore.compact(spark, root, 5L) == 2)
    assert(search() == before, "compaction changed the search result")
    val dirs = fs.listStatus(new org.apache.hadoop.fs.Path(root))
      .map(_.getPath.getName).filter(_.startsWith("batch=")).toSeq
    assert(dirs == Seq("batch=5"))
    // racing append with id >= newBatchId lands after staging: abort
    val e = intercept[IllegalArgumentException] {
      BatchStore.compact(spark, root, 7L,
        () => fs.mkdirs(new org.apache.hadoop.fs.Path(root, "batch=9")))
    }
    assert(e.getMessage.contains("raced"), e.getMessage)
    val after = fs.listStatus(new org.apache.hadoop.fs.Path(root))
      .map(_.getPath.getName).filter(_.startsWith("batch=")).sorted.toSeq
    assert(after == Seq("batch=5", "batch=9"), "nothing must have committed")
    fs.delete(new org.apache.hadoop.fs.Path(root), true)
  }

  test("topKStream: final state identical across chunkings, equal to the batch ranking") {
    import spark.implicits._
    import graft.streaming.EventStream
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val events = (1L to 60L).map(i =>
        (i, s"t${i % 2}", ((i * 2654435761L) % 1000L).toDouble))
      def run(chunks: Seq[Seq[(Long, String, Double)]]): Seq[(String, Long, Long, Double)] = {
        implicit val sqlCtx = spark.sqlContext
        val ms = org.apache.spark.sql.execution.streaming.runtime
          .MemoryStream[(Long, String, Double)]
        val out = EventStream.topKStream(spark,
          ms.toDF().toDF("event_id", "event_type", "value"), k = 3).toDF()
        val sink = "topk_spec_" + java.util.UUID.randomUUID().toString.take(8)
        val q = out.writeStream.format("memory").queryName(sink)
          .outputMode("update").start()
        try chunks.foreach { c => ms.addData(c: _*); q.processAllAvailable() }
        finally q.stop()
        val t = spark.table(sink)
        t.withColumn("__mx", max(col("n_seen")).over(
            org.apache.spark.sql.expressions.Window.partitionBy(col("event_type"))))
          .filter(col("n_seen") === col("__mx"))
          .select(col("event_type"), col("n_seen"), col("rank"), col("value"))
          .as[(String, Long, Long, Double)].collect().toSeq.sorted
      }
      val oneShot = run(Seq(events))
      val chunked = run(events.grouped(7).toSeq)
      assert(oneShot == chunked, "chunking changed the final top-k")
      val batch = events.groupBy(_._2).flatMap { case (t, es) =>
        es.sortBy(e => (-e._3, e._1)).take(3).zipWithIndex
          .map { case (e, i) => (t, es.size.toLong, i + 1L, e._3) }
      }.toSeq.sorted
      assert(oneShot == batch, s"streamed != batch:\n$oneShot\n$batch")
    } finally prev.fold(
      spark.conf.unset("spark.sql.streaming.stateStore.providerClass"))(
      spark.conf.set("spark.sql.streaming.stateStore.providerClass", _))
  }

  // ----------------------------- hard-negative mining

  test("hardNegatives: every neighbor label-mismatched, where raw top-k would return positives") {
    val e = ScaleGen.plantedEmbeddings(spark, clusters = 50,
      perCluster = 10, dim = 64, noise = 1.0).localCheckpoint()
    val q = e.filter(col("vec_id") < 5)
    val lbl = e.select(col("vec_id"), col("label"))
    val hn = Similarity.hardNegatives(e, q, "vec_id", "label", "embedding", k = 3)
      .join(lbl.withColumnRenamed("vec_id", "query_id")
        .withColumnRenamed("label", "ql"), "query_id")
      .join(lbl.withColumnRenamed("vec_id", "neighbor_id")
        .withColumnRenamed("label", "nl"), "neighbor_id")
    assert(hn.filter(col("ql") === col("nl")).count() == 0,
      "a hard negative shared the query's label")
    assert(hn.count() == 15, "3 negatives per query")
    // the predicate matters: the raw top-3 on this fixture ARE mates
    val raw = Similarity.bruteForceTopK(e, q, "vec_id", "embedding", k = 3)
      .join(lbl.withColumnRenamed("vec_id", "query_id")
        .withColumnRenamed("label", "ql"), "query_id")
      .join(lbl.withColumnRenamed("vec_id", "neighbor_id")
        .withColumnRenamed("label", "nl"), "neighbor_id")
    assert(raw.filter(col("ql") === col("nl")).count() > 0,
      "fixture must make raw neighbors positives, or the spec is vacuous")
  }

  // ----------------------------- MMR diversity re-ranking

  test("mmrRerank: a near-dup of the top pick loses to a diverse lower-relevance candidate") {
    import spark.implicits._
    val cands = Seq(
      (1L, "A", 0.99, Array(1f, 0f)),
      (1L, "B", 0.98, Array(1f, 0.02f)), // near-dup of A (cos ≈ 0.9998)
      (1L, "C", 0.90, Array(0f, 1f)))    // orthogonal to A
      .toDF("query_id", "cid", "rel", "emb")
    val picks = Similarity.mmrRerank(cands, "query_id", "cid", "rel", "emb",
        k = 3, lam = 0.5)
      .orderBy(col("pick_rank"))
      .select("cid").as[String].collect().toSeq
    // pure relevance would pick A, B, C; MMR penalizes B's redundancy
    assert(picks == Seq("A", "C", "B"), picks.toString)
  }

  // ----------------------------- iterated BPE training

  test("bpeTrain: hand-computed trajectory, greedy overlap handling, early exhaustion") {
    import spark.implicits._
    import graft.operators.Tokenizer
    // words: "aaa" ×2, "ab" ×1
    val docs = Seq((1L, "aaa aaa"), (2L, "ab")).toDF("doc_id", "text")
    val merges = Tokenizer.bpeTrain(docs, "text", nMerges = 5)
      .as[(Int, String, String, Long)].collect().toSeq
    // round 1: (a,a) counts OVERLAPPING pairs (2 per "aaa" × cnt 2 = 4);
    // greedy application leaves [aa, a], NOT [aa, aa-half]
    // round 2: (aa, a) from the rewritten words; round 3: (a, b);
    // then no pairs remain — 3 merges despite nMerges = 5
    assert(merges == Seq((1, "a", "a", 4L), (2, "aa", "a", 2L), (3, "a", "b", 1L)),
      merges.toString)
  }

  test("bpeSegmentStats: distinct words segment once; hand-computed compression") {
    import graft.operators.Tokenizer
    import spark.implicits._
    val docs = Seq((1L, "aaa aaa"), (2L, "ab")).toDF("doc_id", "text")
    // 2 merges: (a,a) then (aa,a) -> "aaa" = 1 token, "ab" = 2
    val r = Tokenizer.bpeSegmentStats(docs, "text", Seq.empty, nMerges = 2)
      .collect().head
    assert(r.getLong(0) == 3L, s"3 word occurrences, got ${r.toSeq}")
    assert(r.getLong(1) == 8L, "total chars 3+3+2")
    assert(r.getLong(2) == 4L, "tokens 1+1+2")
    assert(r.getDouble(3) == 2.0)
  }

  // ----------------------------- containment pairs

  test("containmentPairs: full containment scores 1.0 exactly where Jaccard stays below threshold") {
    import spark.implicits._
    val core = (1 to 30).map(i => s"tok$i").mkString(" ")
    val extra = (31 to 45).map(i => s"tok$i").mkString(" ")
    val docs = Seq(
      (1L, core),                  // fully contained in 2
      (2L, s"$core $extra"),       // superset
      (3L, "x y z entirely disjoint words here")
    ).toDF("doc_id", "text")
    val pairs = Dedup.containmentPairs(docs, "doc_id", "text",
        k = 16, shingleN = 3, bands = 8, threshold = 0.9)
      .as[(Long, Long, Double, Double)].collect()
    assert(pairs.map(p => (p._1, p._2)).toSeq == Seq((1L, 2L)))
    val (_, _, ca, cb) = pairs.head
    assert(ca == 1.0, s"every shingle of doc 1 is in doc 2, got $ca")
    assert(cb < 0.9, s"doc 2 is NOT contained in doc 1, got $cb")
    // the same pair is invisible to symmetric Jaccard at the same bar
    val jac = Dedup.minhashLshPairs(docs, "doc_id", "text",
        k = 16, shingleN = 3, bands = 8, threshold = 0.9).collect()
    assert(jac.isEmpty,
      "Jaccard 0.9 must reject the quote-expansion pair containment catches")
  }

  // ----------------------------- BM25 ranking / n-gram repetition

  test("bm25Search: AND semantics, tf saturation, pivoted length normalization") {
    import spark.implicits._
    import graft.operators.InvertedIndex
    val pad = (1 to 8).map(i => s"pad$i").mkString(" ")
    val docs = Seq(
      (1L, s"alpha beta $pad"),                              // balanced, short
      (2L, ("alpha " * 9).trim + " beta"),                   // alpha-stuffed, same length
      (3L, s"alpha beta $pad $pad $pad " + ("filler " * 60).trim), // long
      (4L, s"alpha only here $pad"),                         // missing beta
      (5L, "unrelated text entirely")
    ).toDF("doc_id", "text")
    val out = InvertedIndex
      .bm25Search(docs, "doc_id", "text", Seq("alpha", "beta"), k = 10)
      .select("doc_id", "score").as[(Long, Double)].collect().toMap
    // AND: docs 4 and 5 excluded
    assert(out.keySet == Set(1L, 2L, 3L))
    // saturation: 9× the alpha tf buys well under 9× the score
    assert(out(2L) < 3 * out(1L),
      s"tf saturation failed: ${out(2L)} vs ${out(1L)}")
    assert(out(2L) > out(1L), "more tf must still score higher")
    // pivoted length norm: same tf in a much longer doc scores lower
    assert(out(3L) < out(1L),
      s"length normalization failed: ${out(3L)} vs ${out(1L)}")
  }

  test("ngramRepetition equals the naive per-doc computation; null symmetry") {
    import spark.implicits._
    import graft.operators.TextAnalysis
    val docs = Seq(
      (1L, "x y z x y z x y z"), // looped phrase: 7 3-grams, 3 distinct
      (2L, "a b c d e f"),       // all distinct
      (3L, "a b"),               // shorter than n
      (4L, null.asInstanceOf[String]),
      (5L, "w w w w w")          // one token repeated: all grams equal
    ).toDF("doc_id", "text")
    val out = TextAnalysis.ngramRepetition(docs, "doc_id", "text", n = 3)
      .collect().map(r => r.getLong(0) -> r).toMap
    def naive(text: String): (Long, Long, Long) = {
      val toks = text.trim.split("\\s+").filter(_.nonEmpty)
      val grams = toks.sliding(3).filter(_.size == 3).map(_.mkString(" ")).toSeq
      val counts = grams.groupBy(identity).view.mapValues(_.size.toLong)
      (grams.size.toLong, counts.size.toLong,
        if (grams.isEmpty) 0L else counts.values.max)
    }
    Seq(1L, 2L, 3L, 5L).foreach { id =>
      val r = out(id)
      val text = Map(1L -> "x y z x y z x y z", 2L -> "a b c d e f",
        3L -> "a b", 5L -> "w w w w w")(id)
      val (ng, nd, top) = naive(text)
      assert((r.getLong(1), r.getLong(2), r.getLong(3)) == ((ng, nd, top)),
        s"doc $id: got ${r.toSeq}, want ($ng, $nd, $top)")
    }
    // the looped doc is flagged: 4/7 duplicate grams, top owns 3/7
    assert(math.abs(out(1L).getDouble(4) - 4.0 / 7.0) < 1e-15)
    assert(math.abs(out(1L).getDouble(5) - 3.0 / 7.0) < 1e-15)
    // all-distinct doc: zero dup fraction
    assert(out(2L).getDouble(4) == 0.0)
    // shorter than n: 0 grams, null fractions
    assert(out(3L).getLong(1) == 0L && out(3L).isNullAt(4))
    // null text: null throughout
    assert(out(4L).isNullAt(1) && out(4L).isNullAt(3) && out(4L).isNullAt(4))
  }

  test("pqSeeds: the centroids lowest-id vectors, deterministically") {
    import spark.implicits._
    val vecs = Seq(5L, 3L, 9L, 1L, 7L).map(i => (i, Array(i.toFloat)))
      .toDF("vec_id", "embedding")
    val seeds = Similarity.pqSeeds(vecs, "vec_id", 3)
      .select("vec_id").as[Long].collect().toSeq
    assert(seeds == Seq(1L, 3L, 5L))
  }
}
