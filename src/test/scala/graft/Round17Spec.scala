package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators._

/** Round-17 hardening pins: the write-once meta's rename race, the
  * ModelCache fingerprint's mtime-granularity hole, and the line-df
  * store's legacy-layout migration path. */
class Round17Spec extends AnyFunSuite {
  lazy val spark = Sessions.local(4)

  private def tmpDir(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  test("commitIntMeta: a racing second writer with a different value " +
      "fails fast instead of silently overwriting the winner's pin") {
    val root = tmpDir("graft_meta_race")
    // writer A committed; writer B lost the exists() check race and
    // goes straight to the staged-rename path — on a POSIX filesystem
    // FileSystem.rename would OVERWRITE A's pin here, and B's rows
    // would later be validated against B's value while A's rows sit
    // beside them. The FileContext commit refuses the overwrite and B
    // validates against A's committed value.
    BatchStore.ensureIntMeta(spark, root, "_dim", "dim", 64)
    val e = intercept[IllegalArgumentException] {
      BatchStore.commitIntMeta(spark, root, "_dim", "dim", 128)
    }
    assert(e.getMessage.contains("dim=64"))
    assert(BatchStore.readIntMeta(spark, root, "_dim", "dim") == 64)
    // same value: the race loser validates clean (idempotent retry)
    BatchStore.commitIntMeta(spark, root, "_dim", "dim", 64)
    // and no staging litter survives either path
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sessionState.newHadoopConf())
    assert(!fs.listStatus(new org.apache.hadoop.fs.Path(root))
      .exists(_.getPath.getName.startsWith("._dim-")))
  }

  test("ModelCache: delete-and-recreate of a batch id with the dir " +
      "mtime pinned back still invalidates (file-level fingerprint)") {
    import spark.implicits._
    val root = tmpDir("graft_mc_recreate")
    BatchStore.append(Seq((1L, "a")).toDF("id", "v"), root, 1L)
    val mc = new ModelCache
    var computes = 0
    def serve() = mc.cached(spark, root, "t") {
      computes += 1; spark.read.parquet(root)
    }
    serve(); serve()
    assert(computes == 1, "unchanged store must serve from the cache")
    // recreate batch=1 with DIFFERENT content, then pin the dir mtime
    // back to the original value — the dir-(name, mtime) identity
    // alone would serve the stale frame (the object-store /
    // coarse-mtime scenario); the content summary must not.
    val p = new org.apache.hadoop.fs.Path(root, "batch=1")
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    val dirM = fs.getFileStatus(p).getModificationTime
    fs.delete(p, true)
    BatchStore.append(Seq((1L, "a"), (2L, "bb")).toDF("id", "v"), root, 1L)
    fs.setTimes(p, dirM, -1)
    assert(fs.getFileStatus(p).getModificationTime == dirM,
      "test harness: dir mtime must be pinned back for the scenario")
    serve()
    assert(computes == 2, "recreated batch content must invalidate")
    mc.releaseAll()
  }

  test("PlanFingerprint: same query twice → same hash; different " +
      "queries differ; session noise normalizes away") {
    val sf = "/root/testdata/sf0.001"
    def h(n: String) = PlanFingerprint.hash(
      SparkEntry.queries(n)(spark, sf))
    assert(h("q09_top20_ltv") == h("q09_top20_ltv"),
      "re-planning the same query must fingerprint identically")
    assert(h("q09_top20_ltv") != h("q01_global_agg"))
    // the normalizer strips exactly the per-session noise: expression
    // ids, temp paths, UUIDs, RDD ids
    val a = "HashAggregate(keys=[chash#4512], functions=[count(1)]) " +
      "Scan parquet [doc_id#12L] Location: InMemoryFileIndex " +
      "[file:/tmp/graft_q134_store12/batch=1], RDD[1377] rdd_22_1 " +
      "31ce66b2-07b1-4b2c-9c5e-aaaaaaaaaaaa"
    val b = "HashAggregate(keys=[chash#99], functions=[count(1)]) " +
      "Scan parquet [doc_id#7L] Location: InMemoryFileIndex " +
      "[file:/tmp/graft_q134_store99/batch=1], RDD[9] rdd_4_0 " +
      "00000000-1111-2222-3333-444444444444"
    assert(PlanFingerprint.normalize(a) == PlanFingerprint.normalize(b))
    assert(PlanFingerprint.normalize(a) !=
      PlanFingerprint.normalize(a.replace("count(1)", "sum(1)")))
  }

  test("decodeWavPcm: exact sample math on 8/16-bit, clip rails, and " +
      "the untrusted-input fallbacks") {
    import graft.operators.Multimodal
    // hand-built 16-bit mono: amplitudes 0, 32767, -32768, -1
    val b16 = Multimodal.wavBytes(8000, 1, 16, 4)
    val data = b16.length - 8 // patch the 8 data bytes in place
    def put16(i: Int, v: Int): Unit = {
      b16(data + 2 * i) = (v & 0xff).toByte
      b16(data + 2 * i + 1) = ((v >> 8) & 0xff).toByte
    }
    put16(0, 0); put16(1, 32767); put16(2, -32768 & 0xffff); put16(3, -1)
    val p = Multimodal.decodeWavPcm(b16).get
    assert(p.n_samples == 4 && p.peak == 32768 && p.clipped == 2)
    assert(p.sum_abs == 0L + 32767 + 32768 + 1)
    assert(p.sum_sq == 32767L * 32767 + 32768L * 32768 + 1)
    // 8-bit is unsigned-rebased: bytes (i % 251) → amp (i % 251) - 128
    val p8 = Multimodal.decodeWavPcm(Multimodal.wavBytes(11025, 1, 8, 3)).get
    assert(p8.bits == 8 && p8.n_samples == 3)
    assert(p8.sum_abs == 128 + 127 + 126 && p8.clipped == 1)
    // truncated data chunk: declared size clamps to the bytes present
    val trunc = Multimodal.wavBytes(8000, 1, 16, 10).dropRight(5)
    assert(Multimodal.decodeWavPcm(trunc).get.n_samples == 7,
      "15 data bytes = 7 whole samples")
    // non-PCM format code and garbage both take the None fallback
    val nonPcm = Multimodal.wavBytes(8000, 1, 16, 2)
    nonPcm(20) = 3 // fmt audioFormat = IEEE float
    assert(Multimodal.decodeWavPcm(nonPcm).isEmpty)
    assert(Multimodal.decodeWavPcm("not a wav".getBytes).isEmpty)
  }

  test("retireLedgerBefore drops whole epochs below the cutoff, keeps " +
      "tombstones, and the funnel over the retained window is intact") {
    import spark.implicits._
    val root = tmpDir("graft_ledger_ret")
    def epoch(b: Long) = Seq(
      (b * 10 + 1, "d1", "kept"), (b * 10 + 2, "d1", "dedup"),
      (b * 10 + 3, "d2", "quality")).toDF("doc_id", "source", "stage")
    (1L to 4L).foreach(b => BatchStore.append(epoch(b), root, b))
    CurationPipeline.deleteFromLedger(Seq(31L).toDF("doc_id"), "doc_id",
      root, batchId = 5L)
    assert(CurationPipeline.retireLedgerBefore(spark, root, 3L) == 2)
    val served = CurationPipeline.readLedger(spark, root, "doc_id")
    assert(served.select("batch").distinct().as[Int].collect().sorted
      .toSeq == Seq(3, 4), "only epochs >= cutoff survive")
    assert(served.filter(col("doc_id") === 31L).isEmpty,
      "tombstones still mask retained epochs after retention")
    val funnel = CurationPipeline.funnel(served)
    assert(funnel.filter(col("batch") === 4).count() == 3)
    // idempotent re-run
    assert(CurationPipeline.retireLedgerBefore(spark, root, 3L) == 0)
  }

  // ------------- signature-store Bloom sidecars (the pruned serves)

  /** 6 history batches of mutually-distinct docs + a slice that
    * collides only with batch 2 — the fixture every bloom-prune test
    * shares. Docs are 12 tokens so near-dups shingle richly. */
  private def bloomFixture(root: String): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    def doc(b: Int, i: Int): String =
      (0 until 12).map(t => s"w${b}x${i}t$t").mkString(" ")
    (1 to 6).foreach { b =>
      val docs = (0 until 30)
        .map(i => (b * 1000L + i, doc(b, i))).toDF("doc_id", "text")
      operators.Dedup.writeSignatureStoreBanded(docs, "doc_id", "text",
        k = 8, shingleN = 3, bands = 4, root = root, batchId = b.toLong)
    }
    // slice: one exact dup of batch 2, one near-dup of batch 2 (last
    // token changed), two fresh docs
    Seq(
      (9001L, doc(2, 5)),
      (9002L, doc(2, 7).split(" ").init.mkString(" ") + " zzz"),
      (9003L, (0 until 12).map(t => s"fresh9003t$t").mkString(" ")),
      (9004L, (0 until 12).map(t => s"fresh9004t$t").mkString(" ")))
      .toDF("doc_id", "text").localCheckpoint()
  }

  test("bloom-pruned incremental dedup equals the flat serve and reads " +
      "a fraction of the store's records") {
    val root = tmpDir("graft_sig_bloom")
    val slice = bloomFixture(root)
    def sorted(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("doc_id").collect().map(_.toSeq).toSeq
    val (prunedOut, prunedM) = Metrics.capture(spark) {
      sorted(operators.Dedup.incrementalDedupFromStoreAt(spark, root,
        slice, "doc_id", "text", k = 8, shingleN = 3, bands = 4,
        threshold = 0.5))
    }
    val (flatOut, flatM) = Metrics.capture(spark) {
      sorted(operators.Dedup.incrementalDedupFromStore(
        operators.Dedup.readSignatureStore(spark, root),
        slice, "doc_id", "text", k = 8, shingleN = 3, bands = 4,
        threshold = 0.5))
    }
    assert(prunedOut == flatOut, "pruning must never change the verdict")
    // the slice's dup really is flagged (the fixture is live)
    assert(prunedOut.exists(r => r.head == 9001L && r(1) == true))
    // exact + near passes each scanned ~1 of 6 batches instead of 6
    assert(prunedM.inputRecords * 2 < flatM.inputRecords,
      s"pruned=${prunedM.inputRecords} flat=${flatM.inputRecords}")
  }

  test("bloom sidecars: compaction refreshes them; erasure keeps the " +
      "masked pruned serve identical to the masked flat serve") {
    import spark.implicits._
    val root = tmpDir("graft_sig_bloom_life")
    val slice = bloomFixture(root)
    def prunedVerdicts() =
      operators.Dedup.incrementalDedupFromStoreAt(spark, root, slice,
        "doc_id", "text", k = 8, shingleN = 3, bands = 4, threshold = 0.5,
        masked = true)
        .orderBy("doc_id").collect().map(_.toSeq).toSeq
    val before = prunedVerdicts()
    // erase the doc the slice exact-dups: both serve paths must admit
    // the content again (the store no longer remembers it)
    operators.Dedup.deleteFromSignatureStore(
      Seq(2005L).toDF("doc_id"), "doc_id", root, batchId = 7L)
    val afterErase = prunedVerdicts()
    assert(afterErase != before, "erased content must change the verdict")
    assert(afterErase.exists(r => r.head == 9001L && r(1) == false),
      "content matching only the ERASED doc must be admitted again")
    val flatMasked = operators.Dedup.incrementalDedupFromStore(
      operators.Dedup.readSignatureStore(spark, root, "doc_id"),
      slice, "doc_id", "text", k = 8, shingleN = 3, bands = 4,
      threshold = 0.5).orderBy("doc_id").collect().map(_.toSeq).toSeq
    assert(afterErase == flatMasked,
      "masked pruned serve must equal the masked flat serve")
    // compact: dangling sidecars dropped, the merged batch re-sketched
    operators.Dedup.purgeSignatureStore(spark, root, "doc_id", 8L)
    operators.Dedup.compactSignatureStore(spark, root, "doc_id", 9L)
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val sidecars = fs.listStatus(
        new org.apache.hadoop.fs.Path(root, "_bloom"))
      .map(_.getPath.getName).filter(_.endsWith(".bf")).sorted.toSeq
    assert(sidecars == Seq("batch=9.bf"), sidecars)
    assert(prunedVerdicts() == afterErase,
      "compaction must not change the served verdicts")
  }

  test("hamming store: bloom-pruned incremental dedup equals the flat " +
      "scan era and reads a fraction of the store") {
    import spark.implicits._
    val root = tmpDir("graft_ham_bloom")
    val bandCols = Seq("b0", "b1", "b2", "b3")
    def bands(b: Int, i: Int): (Long, Long, Long, Long, Long) =
      (b * 1000L + i, b * 100000L + i * 4 + 0, b * 100000L + i * 4 + 1,
        b * 100000L + i * 4 + 2, b * 100000L + i * 4 + 3)
    (1 to 6).foreach { b =>
      operators.Dedup.writeHammingStore(
        (0 until 40).map(i => bands(b, i))
          .toDF("img_id", "b0", "b1", "b2", "b3"),
        "img_id", bandCols, root, b.toLong)
    }
    // slice: one exact collision with batch 2's doc 5, two strangers
    val slice = Seq(
      (9001L, 200020L, 200021L, 200022L, 200023L),
      (9002L, 777L, 778L, 779L, 780L),
      (9003L, 881L, 882L, 883L, 884L))
      .toDF("img_id", "b0", "b1", "b2", "b3").localCheckpoint()
    val (out, m) = Metrics.capture(spark) {
      operators.Dedup.incrementalHammingDedup(spark, root, slice,
        "img_id", bandCols, maxDist = 0)
        .orderBy("img_id").collect().map(_.toSeq).toSeq
    }
    assert(out.exists(r => r.head == 9001L && r(1) == 1L),
      "the planted collision must be found through the pruned scan")
    assert(out.exists(r => r.head == 9002L && r(1) == 0L))
    // 6 batches × 40 rows on disk; the serve must scan ~1 batch (the
    // candidate + verify passes), not all 6
    assert(m.inputRecords < 40L * 6,
      s"read ${m.inputRecords} records — hamming sidecar pruning not " +
        "effective")
    operators.Checkpoints.releasePinned(slice)
  }

  test("migrateLineDfStoreToBuckets: legacy flat store serves " +
      "identically after migration and accepts appends again") {
    import spark.implicits._
    val root = tmpDir("graft_linedf_legacy")
    val docs1 = Seq(
      (1L, "d1", "nav\nalpha"), (2L, "d1", "nav\nbeta"),
      (3L, "d1", "nav\ngamma"), (4L, "d2", "foot\ndelta"),
      (5L, "d2", "foot\nepsilon")).toDF("id", "domain", "text")
    val slice = Seq(
      (6L, "d1", "nav\nzeta"), (7L, "d2", "foot\neta"))
      .toDF("id", "domain", "text")
    // the pre-round-16 layout: flat count batches, no _dbuckets meta
    BatchStore.append(
      Boilerplate.lineDfCounts(docs1, "id", "domain", "text"), root, 1L)
    // appends refuse the legacy store loudly
    val e = intercept[IllegalArgumentException] {
      Boilerplate.writeLineDfStore(slice, "id", "domain", "text", root, 2L)
    }
    assert(e.getMessage.contains("legacy"))
    def served() = Boilerplate.stripRepeatedLinesFromStore(spark, root,
        slice, "id", "domain", "text", minDf = 2L)
      .orderBy("id").collect().map(_.toSeq).toSeq
    val before = served()
    assert(before.nonEmpty)
    val folded = Boilerplate.migrateLineDfStoreToBuckets(
      spark, root, "domain", newBatchId = 2L, buckets = 4)
    assert(folded == 1)
    assert(BatchStore.readIntMetaOpt(spark, root, "_dbuckets",
      "domain-buckets").contains(4))
    assert(served() == before, "migration must not change the serve")
    // and the store is appendable again, under the bucketed layout
    // (at the MIGRATED bucket count — the write-once pin holds)
    Boilerplate.writeLineDfStore(slice, "id", "domain", "text", root, 3L,
      buckets = 4)
    val p = new org.apache.hadoop.fs.Path(root, "batch=3")
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    assert(fs.listStatus(p).exists(_.getPath.getName.startsWith("__db=")))
  }
}
