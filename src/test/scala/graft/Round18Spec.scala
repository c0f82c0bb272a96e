package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators._
import graft.operators.LateInteraction

/** Round-18 hardening pins: cross-JVM-deterministic plan fingerprints
  * (lambda identities stripped), the bounded/chunked sidecar probe,
  * stale-sidecar pre-deletes on store re-appends, Hamming sidecar
  * maintenance convergence, and the post-run plan-snapshot rewrite. */
class Round18Spec extends AnyFunSuite {
  lazy val spark = Sessions.local(4)

  private def tmpDir(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  test("PlanFingerprint: JVM-assigned lambda indices, hex addresses " +
      "and identity hashes normalize away; real shape changes do not") {
    // the rendering MapElements/SerializeFromObject produce for typed
    // Dataset closures — the lambda index and both hex addresses are
    // JVM-assigned, stable within one JVM but not across runs (the
    // class of noise an in-JVM determinism pin cannot catch)
    val a = "MapElements graft.queries.TextQueries$$Lambda$1234/" +
      "0x00007f5e342c9000@4a5b6c7d, obj#123: struct<media_id:bigint>"
    val b = "MapElements graft.queries.TextQueries$$Lambda$87/" +
      "0x00007fab00112233@deadbeef, obj#123: struct<media_id:bigint>"
    assert(PlanFingerprint.normalize(a) == PlanFingerprint.normalize(b))
    // Java 21 renders without the index — same normalization
    val c = a.replace("$$Lambda$1234/0x00007f5e342c9000",
      "$$Lambda/0x00007f5e342c9000")
    assert(PlanFingerprint.normalize(a) == PlanFingerprint.normalize(c))
    // a DIFFERENT closure owner class is a real shape change
    val d = a.replace("TextQueries", "ImageQueries")
    assert(PlanFingerprint.normalize(a) != PlanFingerprint.normalize(d))
    // object identity hashes on Aggregator renderings strip too
    val e1 = "ObjectHashAggregate(functions=[minhashunion(" +
      "graft.operators.MinHashUnion@1f2e3d4c, ...)])"
    val e2 = e1.replace("@1f2e3d4c", "@77aa88bb")
    assert(PlanFingerprint.normalize(e1) == PlanFingerprint.normalize(e2))
    // higher-order-function lambda variables draw fresh names from a
    // SESSION-GLOBAL counter: `x_8` in a fresh JVM is `x_31` after
    // other queries planned in the same session (r18: the residual
    // phantom plan_changes on the MinHash/array-fold family)
    val f1 = "Project [array_min(transform(hs#201, lambdafunction(" +
      "(((lambda x_8#202 * 1103527590) + 1861195998) % 4294967311), " +
      "lambda x_8#202, false))) AS mh0#203]"
    val f2 = f1.replace("x_8#202", "x_31#417").replace("#201", "#988")
      .replace("#203", "#991")
    assert(PlanFingerprint.normalize(f1) == PlanFingerprint.normalize(f2))
    // ... but a different fold CONSTANT is a real shape change
    val f3 = f1.replace("1103527590", "1103527591")
    assert(PlanFingerprint.normalize(f1) != PlanFingerprint.normalize(f3))
    // scan-metadata fields truncate at a fixed RAW width, so exprId
    // digit counts shift the cut point — a truncated bracketed field
    // collapses entirely instead of hashing its session-dependent tail
    val g1 = "FileScan parquet [doc_id#12,text#13] DataFilters: " +
      "[isnotnull(text#13), (octet_length(static_invoke(Encode.encode(" +
      "text#13, UTF-8..., Format: Parquet, " +
      "PushedFilters: [IsNotNull(text)], ReadSchema: struct<text:string>"
    val g2 = g1.replace("text#13, UTF-8...", "text#1333, UT...")
      .replace("text#13)", "text#1333)")
    assert(PlanFingerprint.normalize(g1) == PlanFingerprint.normalize(g2))
    // the UNtruncated parts of the scan line still pin shape: a
    // pushed-filter change is a real plan change
    val g3 = g1.replace("PushedFilters: [IsNotNull(text)]",
      "PushedFilters: []")
    assert(PlanFingerprint.normalize(g1) != PlanFingerprint.normalize(g3))
  }

  // ------------- the bounded sidecar probe (driver-memory cap)

  /** 6 history batches of mutually-distinct docs + a slice colliding
    * only with batch 2 (the Round17Spec bloom fixture). */
  private def sigFixture(root: String): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    def doc(b: Int, i: Int): String =
      (0 until 12).map(t => s"w${b}x${i}t$t").mkString(" ")
    (1 to 6).foreach { b =>
      val docs = (0 until 30)
        .map(i => (b * 1000L + i, doc(b, i))).toDF("doc_id", "text")
      Dedup.writeSignatureStoreBanded(docs, "doc_id", "text",
        k = 8, shingleN = 3, bands = 4, root = root, batchId = b.toLong)
    }
    Seq(
      (9001L, doc(2, 5)),
      (9002L, doc(2, 7).split(" ").init.mkString(" ") + " zzz"),
      (9003L, (0 until 12).map(t => s"fresh9003t$t").mkString(" ")),
      (9004L, (0 until 12).map(t => s"fresh9004t$t").mkString(" ")))
      .toDF("doc_id", "text").localCheckpoint()
  }

  test("BatchBlooms over-cap probe: the chunked path prunes to the " +
      "same batches and the pruned serve verdicts are unchanged") {
    val root = tmpDir("graft_bloom_chunked")
    val slice = sigFixture(root)
    def verdicts() =
      Dedup.incrementalDedupFromStoreAt(spark, root, slice, "doc_id",
        "text", k = 8, shingleN = 3, bands = 4, threshold = 0.5)
        .orderBy("doc_id").collect().map(_.toSeq).toSeq
    def digestHits() = BatchBlooms.hits(spark, root,
      Seq("d" -> slice.withColumn("__h", md5(col("text")))
        .select(col("__h"))), beforeBatch = None)
    val fastHits = digestHits()
    val fastVerdicts = verdicts()
    val priorCap = BatchBlooms.MaxDriverProbeKeys
    try {
      // cap below the slice's key count → every group takes the
      // chunked path (cap-sized chunks, shrinking batch set)
      BatchBlooms.MaxDriverProbeKeys = 2
      assert(digestHits() == fastHits,
        "chunked probe must hit exactly the one-shot probe's batches")
      val (chunkedVerdicts, m) = Metrics.capture(spark) { verdicts() }
      assert(chunkedVerdicts == fastVerdicts,
        "the cap must never change a serve verdict")
      assert(chunkedVerdicts.exists(r => r.head == 9001L && r(1) == true))
      // pruning power intact under the cap: ~1 of 6 batches scanned
      assert(m.inputRecords < 30L * 6 * 2,
        s"read ${m.inputRecords} records — over-cap path lost pruning")
    } finally BatchBlooms.MaxDriverProbeKeys = priorCap
    Checkpoints.releasePinned(slice)
  }

  test("BatchBlooms: a wanted batch whose sidecar vanishes between " +
      "listing and probe job is scanned, never silently pruned") {
    import spark.implicits._
    val root = tmpDir("graft_bloom_vanish")
    sigFixture(root)
    // simulate the sweep race: sidecar present at the existence check,
    // gone by job time — representable as a truncated/corrupt file,
    // which the probe must treat as all-true (scan)
    val p = BatchBlooms.path(root, 2L)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    val out = fs.create(p, true)
    try out.write(Array[Byte](1, 2)) finally out.close()
    val hits = BatchBlooms.hits(spark, root,
      Seq("d" -> Seq("zzz-not-present").toDF("k")), beforeBatch = None)
    assert(hits.get.head.contains(2L),
      "an unreadable sidecar's batch must stay in the scan set")
  }

  // ------------- stale-sidecar pre-deletes (the re-append race)

  test("writeSignatureStore drops a stale sidecar for its batch id " +
      "BEFORE the append commits (fail-fast retry proves ordering)") {
    import spark.implicits._
    val root = tmpDir("graft_sig_stale")
    val docs = Seq((1L, "alpha beta gamma delta epsilon zeta eta " +
      "theta iota kappa")).toDF("doc_id", "text")
    Dedup.writeSignatureStore(docs, "doc_id", "text", k = 4,
      shingleN = 3, root = root, batchId = 1L)
    // plant a bogus 'stale' sidecar content for batch 1, then retry
    // the committed batch: the append fails fast on the existing dir,
    // but by then the pre-delete must already have removed the stale
    // sketch — the crash window's worst case is sidecar-LESS (always
    // scanned), never wrongly-pruned
    val p = BatchBlooms.path(root, 1L)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    val out = fs.create(p, true)
    try out.write("stale".getBytes) finally out.close()
    intercept[Exception] {
      Dedup.writeSignatureStore(docs, "doc_id", "text", k = 4,
        shingleN = 3, root = root, batchId = 1L)
    }
    assert(!fs.exists(p),
      "the stale sidecar must be gone before the append runs")
  }

  test("writeHammingStore drops a stale sidecar for its batch id " +
      "BEFORE the append commits") {
    import spark.implicits._
    val root = tmpDir("graft_ham_stale")
    val rows = Seq((1L, 10L, 11L, 12L, 13L))
      .toDF("img_id", "b0", "b1", "b2", "b3")
    val bandCols = Seq("b0", "b1", "b2", "b3")
    Dedup.writeHammingStore(rows, "img_id", bandCols, root, 1L)
    val p = BatchBlooms.path(root, 1L)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    val out = fs.create(p, true)
    try out.write("stale".getBytes) finally out.close()
    intercept[Exception] {
      Dedup.writeHammingStore(rows, "img_id", bandCols, root, 1L)
    }
    assert(!fs.exists(p),
      "the stale sidecar must be gone before the append runs")
  }

  // ------------- sidecar maintenance convergence

  test("refreshHammingBlooms: a store that lost a sidecar scans flat " +
      "until maintenance, then prunes again with identical verdicts") {
    import spark.implicits._
    val root = tmpDir("graft_ham_refresh")
    val bandCols = Seq("b0", "b1", "b2", "b3")
    (1 to 6).foreach { b =>
      Dedup.writeHammingStore(
        (0 until 40).map(i => (b * 1000L + i,
          b * 100000L + i * 4 + 0, b * 100000L + i * 4 + 1,
          b * 100000L + i * 4 + 2, b * 100000L + i * 4 + 3))
          .toDF("img_id", "b0", "b1", "b2", "b3"),
        "img_id", bandCols, root, b.toLong)
    }
    val slice = Seq(
      (9001L, 200020L, 200021L, 200022L, 200023L),
      (9002L, 777L, 778L, 779L, 780L))
      .toDF("img_id", "b0", "b1", "b2", "b3").localCheckpoint()
    def serve() = Dedup.incrementalHammingDedup(spark, root, slice,
      "img_id", bandCols, maxDist = 0)
      .orderBy("img_id").collect().map(_.toSeq).toSeq
    val before = serve()
    assert(before.exists(r => r.head == 9001L && r(1) == 1L))
    // crash between batch commit and sidecar rename: batch 2's sketch
    // is lost — the serve must still be correct (batch 2 scanned flat)
    val lost = BatchBlooms.path(root, 2L)
    val fs = lost.getFileSystem(spark.sessionState.newHadoopConf())
    fs.delete(lost, false)
    assert(serve() == before,
      "a sidecar-less batch must be scanned, verdicts unchanged")
    // maintenance converges the store back to pruned serves
    assert(Dedup.refreshHammingBlooms(spark, root, bandCols) == 1)
    assert(fs.exists(lost), "the lost sidecar must be re-derived")
    val (after, m) = Metrics.capture(spark) { serve() }
    assert(after == before)
    assert(m.inputRecords < 40L * 6,
      s"read ${m.inputRecords} records — refresh did not restore pruning")
    // purge sweeps the replaced batches' sidecars (stale litter a
    // re-appended batch id must never trust)
    Dedup.deleteFromHammingStore(Seq(1001L).toDF("img_id"), "img_id",
      root, batchId = 7L)
    Dedup.purgeHammingStore(spark, root, "img_id", newBatchId = 8L)
    val bloomDir = new org.apache.hadoop.fs.Path(root, "_bloom")
    val left = fs.listStatus(bloomDir).map(_.getPath.getName)
      .filter(_.endsWith(".bf")).toSeq
    assert(left.isEmpty, s"dangling sidecars survived purge: $left")
    // and maintenance re-sketches the merged batch
    assert(Dedup.refreshHammingBlooms(spark, root, bandCols) == 1)
    Checkpoints.releasePinned(slice)
  }

  test("purgeSignatureStore refreshes sidecars: the merged batch is " +
      "re-sketched, replaced batches' sketches swept") {
    import spark.implicits._
    val root = tmpDir("graft_sig_purge_refresh")
    sigFixture(root)
    Dedup.deleteFromSignatureStore(Seq(2005L).toDF("doc_id"), "doc_id",
      root, batchId = 7L)
    Dedup.purgeSignatureStore(spark, root, "doc_id", newBatchId = 8L)
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val sidecars = fs.listStatus(
        new org.apache.hadoop.fs.Path(root, "_bloom"))
      .map(_.getPath.getName).filter(_.endsWith(".bf")).sorted.toSeq
    assert(sidecars == Seq("batch=8.bf"), sidecars)
  }

  test("pcmWindowEnergy: window boundaries, tail window judged on its " +
      "own length, strict threshold, all-silent trim") {
    import graft.operators.Multimodal
    // 16-bit mono, 130 samples → windows of 64/64/2
    val b = Multimodal.wavBytes(8000, 1, 16, 130)
    val data = b.length - 260
    def put16(i: Int, v: Int): Unit = {
      b(data + 2 * i) = (v & 0xff).toByte
      b(data + 2 * i + 1) = ((v >> 8) & 0xff).toByte
    }
    (0 until 130).foreach(put16(_, 0))
    (64 until 128).foreach(put16(_, 100)) // window 1 hot: mean sq 10000
    put16(129, 3) // tail window (2 samples): sum_sq 9, mean sq 4.5
    val p = Multimodal.pcmWindowEnergy(b, window = 64, threshold = 5000L).get
    assert(p.n_samples == 130 && p.n_windows == 3)
    assert(p.active_windows == 1 && p.first_active == 1 &&
      p.last_active == 1)
    assert(p.voiced_samples == 64 && p.voiced_sum_sq == 64L * 10000)
    // the tail window's bar is threshold × ITS 2 samples (10000), not
    // a full window's — 9 > 10000 is false; with a tiny threshold the
    // same tail flips active and the boundaries move
    val p2 = Multimodal.pcmWindowEnergy(b, window = 64, threshold = 4L).get
    assert(p2.active_windows == 2 && p2.first_active == 1 &&
      p2.last_active == 2 && p2.voiced_samples == 66)
    // strict >: a window whose energy EQUALS threshold × n is silent
    val eq = Multimodal.wavBytes(8000, 1, 16, 4)
    val eqData = eq.length - 8
    (0 until 4).foreach { i =>
      eq(eqData + 2 * i) = 10; eq(eqData + 2 * i + 1) = 0
    }
    assert(Multimodal.pcmWindowEnergy(eq, 4, 100L).get.active_windows == 0)
    assert(Multimodal.pcmWindowEnergy(eq, 4, 99L).get.active_windows == 1)
    // all-silent file: trim everything
    val silent = Multimodal.wavBytes(8000, 1, 16, 64)
    val sData = silent.length - 128
    (0 until 64).foreach { i =>
      silent(sData + 2 * i) = 0; silent(sData + 2 * i + 1) = 0
    }
    val ps = Multimodal.pcmWindowEnergy(silent, 64, 0L).get
    assert(ps.active_windows == 0 && ps.first_active == -1 &&
      ps.last_active == -1 && ps.voiced_samples == 0L &&
      ps.voiced_sum_sq == 0L)
    // exact-boundary file: 128 samples → exactly 2 windows
    assert(Multimodal.pcmWindowEnergy(
      Multimodal.wavBytes(8000, 1, 16, 128), 64, 0L).get.n_windows == 2)
    // untrusted input: garbage takes the None fallback
    assert(Multimodal.pcmWindowEnergy("not a wav".getBytes, 64, 0L).isEmpty)
  }

  test("token index: batch-level sidecar prune serves identically to " +
      "the sidecar-less store and reads a fraction of a deep one") {
    import spark.implicits._
    val root = tmpDir("graft_ti_bloom")
    def passDocs(b: Int) = (0 until 10).map(i =>
      (b * 100L + i, s"tok${b}x$i alpha$b beta$i gamma${b}x$i"))
      .toDF("neighbor_id", "text")
    (1 to 6).foreach(b => LateInteraction.writeTokenIndex(passDocs(b),
      "neighbor_id", "text", dim = 8, root, b.toLong, buckets = 4))
    val queries = Seq((1L, "tok2x3 alpha2 beta3")).toDF("query_id", "text")
    val cands = Seq((1L, 203L), (1L, 205L)).toDF("query_id", "neighbor_id")
    def serve() = {
      val r = LateInteraction.maxSimFromTokenIndex(spark, root, cands,
        queries, "query_id", "neighbor_id", "text", dim = 8,
        maxQueryTokens = 8, k = 2)
      val got = r.orderBy("rank").collect().map(_.toSeq).toSeq
      Checkpoints.releasePinned(r); got
    }
    val (pruned, pm) = Metrics.capture(spark) { serve() }
    assert(pruned.nonEmpty)
    // strip every sidecar → the flat-scan era; verdicts identical
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sessionState.newHadoopConf())
    fs.delete(new org.apache.hadoop.fs.Path(root, "_bloom"), true)
    val (flat, fm) = Metrics.capture(spark) { serve() }
    assert(pruned == flat, "sidecar pruning must never change a serve")
    // candidates live wholly in batch 2 → the pruned serve reads ~1
    // of 6 batches' bucket dirs
    assert(pm.inputRecords * 2 < fm.inputRecords,
      s"pruned=${pm.inputRecords} flat=${fm.inputRecords}")
    // maintenance converges a sidecar-less store back to pruned
    assert(LateInteraction.refreshTokenIndexBlooms(spark, root,
      "neighbor_id") == 6)
    val (again, am) = Metrics.capture(spark) { serve() }
    assert(again == pruned)
    assert(am.inputRecords * 2 < fm.inputRecords)
    // erasure composes: purge re-sketches the merged batch
    LateInteraction.deleteFromTokenIndex(Seq(205L).toDF("neighbor_id"),
      "neighbor_id", root, batchId = 7L)
    LateInteraction.purgeTokenIndex(spark, root, "neighbor_id",
      newBatchId = 8L)
    val sidecars = fs.listStatus(
        new org.apache.hadoop.fs.Path(root, "_bloom"))
      .map(_.getPath.getName).filter(_.endsWith(".bf")).sorted.toSeq
    assert(sidecars == Seq("batch=8.bf"), sidecars)
    val after = serve()
    assert(after.map(_(2)) == Seq(203L),
      s"purged passage must be gone from the serve: $after")
  }

  // ------------- post-run plan-snapshot rewrite

  test("writePlanSnapshot merges prior entries for still-registered " +
      "queries missing from the run and retires deleted queries") {
    val dir = new java.io.File(tmpDir("graft_plansnap"))
    val sfDir = "/root/testdata/sf0.001"
    val registered = SparkEntry.queries.keys.toSeq.sorted
    val kept = registered.head // registered but missing from current
    Bench.writePlanSnapshot(sfDir,
      prior = Map(kept -> "aaaa", "q_deleted_long_ago" -> "bbbb"),
      current = Map(registered(1) -> "cccc"), benchDir = dir)
    val back = Bench.readPlanSnapshot(sfDir, benchDir = dir)
    assert(back == Map(kept -> "aaaa", registered(1) -> "cccc"))
    // a snapshot at another sf reads empty (cross-sf plans differ
    // legitimately)
    assert(Bench.readPlanSnapshot("/root/testdata/sf0.1",
      benchDir = dir).isEmpty)
  }
}
