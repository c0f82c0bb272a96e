package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators._

/** Round-16: the cross-epoch model cache ([[graft.operators
  * .ModelCache]]), the erasure-safe as-of read, the shared scalar-meta
  * protocol's corruption diagnostics, and the feature-hashing
  * reserved-name guards.
  */
class Round16Spec extends AnyFunSuite {
  lazy val spark = Sessions.local(4)

  private def tmp(prefix: String) =
    java.nio.file.Files.createTempDirectory(prefix).toString
  private def rm(root: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(root)
    p.getFileSystem(spark.sessionState.newHadoopConf()).delete(p, true)
  }

  // --------------------------------------------------- ModelCache

  test("ModelCache: unchanged store serves the SAME pinned frame; append/compact invalidate; releaseAll unpins") {
    import spark.implicits._
    val root = tmp("graft_mc")
    try {
      LanguageModel.writeLmStore(
        Seq((1L, "alpha beta gamma"), (2L, "beta gamma delta"))
          .toDF("doc_id", "text"),
        "doc_id", "text", root, batchId = 1L)
      val mc = new ModelCache
      var computes = 0
      def serve() = mc.cached(spark, root, "lm-bigrams") {
        computes += 1
        BatchStore.read(spark, root)
          .groupBy(col("w1"), col("w2")).agg(sum(col("cnt")).as("cnt"))
          .filter(col("cnt") =!= 0)
      }
      def rddId(df: org.apache.spark.sql.DataFrame): Int =
        df.queryExecution.analyzed.collect {
          case r: org.apache.spark.sql.execution.LogicalRDD => r.rdd.id
        }.head
      val before = spark.sparkContext.getPersistentRDDs.keySet.toSet
      val a = serve()
      val b = serve()
      assert(computes == 1, "second serve must hit the cache")
      assert(rddId(a) == rddId(b), "hit must be the SAME pinned frame")
      // an append moves the committed-batch fingerprint -> recompute
      LanguageModel.writeLmStore(
        Seq((3L, "delta epsilon zeta")).toDF("doc_id", "text"),
        "doc_id", "text", root, batchId = 2L)
      val c = serve()
      assert(computes == 2, "append must invalidate the cache")
      assert(rddId(c) != rddId(a))
      // the refreshed frame serves the appended counts
      assert(c.filter(col("w1") === "delta" && col("w2") === "epsilon")
        .count() == 1L)
      mc.releaseAll()
      assert(mc.size == 0)
      // only transient pins may remain unreleased; the cache's own are
      // gone (id-set delta discipline — the stale `a` pin was already
      // released at invalidation)
      val leaked = spark.sparkContext.getPersistentRDDs.keySet.toSet -- before
      assert(leaked.isEmpty, s"cache leaked pins: $leaked")
    } finally rm(root)
  }

  test("processSlice with a ModelCache commits the SAME kept set as without") {
    import spark.implicits._
    val CP = CurationPipeline
    val docs = (0L until 60L).map { i =>
      val body =
        if (i % 5 == 0) s"dup group ${i % 10} shared body text here"
        else s"unique body $i with alpha beta gamma tok$i"
      (i, s"src${i % 2}", s"<nav>m</nav>\n<p>$body</p>")
    }.toDF("doc_id", "source", "text")
    def run(models: Option[ModelCache]): Set[Long] = {
      val base = tmp("graft_mc_cp")
      try {
        def p(n: String) = new org.apache.hadoop.fs.Path(base, n).toString
        val st = CP.Stores(p("ldf"), p("qual"), p("lm"), p("sig"), p("kept"))
        val raw = docs.withColumn("text",
          Boilerplate.stripMarkup(col("text")))
        QualityClassifier.writeQualityStore(
          raw.withColumn("label",
            when(col("text").contains("dup group"), lit("bad"))
              .otherwise(lit("good"))),
          "label", "text", buckets = 256, root = st.quality, batchId = 1L)
        Boilerplate.writeLineDfStore(raw, "doc_id", "source", "text",
          st.lineDf, batchId = 1L)
        LanguageModel.writeLmStore(raw, "doc_id", "text", st.lm, 1L)
        val gates = CP.Gates(minDf = 10L, buckets = 256,
          keepLabel = "good", lmCutAvgFp = 0.0, mixKeep = lit(true))
        (0 to 2).foreach(i => CP.processSlice(spark, st, gates,
          docs.filter(col("doc_id") % 3 === i), "doc_id", "source",
          "text", 1L + i, models))
        BatchStore.read(spark, st.kept).select(col("doc_id"))
          .collect().map(_.getLong(0)).toSet
      } finally rm(base)
    }
    val uncached = run(None)
    val mc = new ModelCache
    val cached = try run(Some(mc)) finally mc.releaseAll()
    assert(uncached.nonEmpty && cached == uncached,
      s"cached DAG diverged: ${cached.diff(uncached)} / ${uncached.diff(cached)}")
  }

  // ------------------------------------------- as-of reads vs erasure

  test("readAsOfMasked rebuilds historical state MINUS later takedowns; raw readAsOf stays unmasked") {
    import spark.implicits._
    val root = tmp("graft_asof")
    try {
      BatchStore.append(Seq((1L, "a"), (2L, "b")).toDF("id", "v"), root, 1L)
      BatchStore.append(Seq((3L, "c")).toDF("id", "v"), root, 2L)
      // a takedown lands AFTER the day-1 snapshot was consumed
      Tombstones.append(Seq(1L).toDF("id"), "id", root, batchId = 3L)
      val raw = BatchStore.readAsOf(spark, root, 1L)
        .select(col("id")).collect().map(_.getLong(0)).toSet
      val masked = BatchStore.readAsOfMasked(spark, root, 1L, "id")
        .select(col("id")).collect().map(_.getLong(0)).toSet
      assert(raw == Set(1L, 2L), s"unmasked as-of is the audit read: $raw")
      assert(masked == Set(2L),
        s"masked as-of must not re-serve forgotten ids: $masked")
    } finally rm(root)
  }

  // --------------------------------------- scalar-meta hardening

  test("ensureIntMeta survives a crash-shaped partial write: corrupt meta names the file and the repair") {
    val root = tmp("graft_meta")
    try {
      BatchStore.ensureIntMeta(spark, root, "_dim", "dim", 64)
      assert(BatchStore.readIntMeta(spark, root, "_dim", "dim") == 64)
      // simulate the crash artifact: an empty meta file
      val p = new org.apache.hadoop.fs.Path(root, "_dim")
      val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
      fs.delete(p, false)
      fs.create(p, true).close()
      val e = intercept[IllegalStateException] {
        BatchStore.readIntMeta(spark, root, "_dim", "dim")
      }
      assert(e.getMessage.contains("_dim") &&
        e.getMessage.contains("restore"), e.getMessage)
      // the write path surfaces the same diagnostic instead of an
      // opaque NumberFormatException
      val e2 = intercept[IllegalStateException] {
        BatchStore.ensureIntMeta(spark, root, "_dim", "dim", 64)
      }
      assert(e2.getMessage.contains("corrupt"), e2.getMessage)
    } finally rm(root)
  }

  test("meta write is staged + renamed — no bare-create window leaves a visible partial file") {
    val root = tmp("graft_meta2")
    try {
      BatchStore.ensureIntMeta(spark, root, "_buckets", "buckets", 8)
      // a second writer with a different value fails against the pin
      val e = intercept[IllegalArgumentException] {
        BatchStore.ensureIntMeta(spark, root, "_buckets", "buckets", 16)
      }
      assert(e.getMessage.contains("buckets=8"), e.getMessage)
      // no staging junk left beside the committed meta
      val p = new org.apache.hadoop.fs.Path(root)
      val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
      val names = fs.listStatus(p).map(_.getPath.getName).toSeq
      assert(names == Seq("_buckets"), names.toString)
    } finally rm(root)
  }

  // ------------------------------- streamed near-dup admission sink

  test("nearDupAdmitSlice: a stream of slices equals the sequential fold; replay no-ops; crash window heals") {
    import spark.implicits._
    // three planted relations across epochs (epoch = id % 3):
    //  - ids 10/11: byte-identical content in epochs 1 and 2 — the
    //    epoch-2 copy is an EXACT dup of admitted content;
    //  - ids 20/21: near-identical (one token changed in a long doc)
    //    across epochs 2 and 0 — near-dup, the later arrival loses;
    //  - ids 30/31: in-slice exact dups (both epoch 0) — min id kept;
    //  - everything else unique and admitted.
    val body = (0 to 30).map(i => s"tok$i").mkString(" ")
    val docs = Seq(
      (10L, "shared exact content alpha beta gamma delta"),
      (11L, "shared exact content alpha beta gamma delta"),
      (21L, body), (20L, body.replace("tok7", "tokX")),
      (30L, "twin content one two three"),
      (33L, "twin content one two three"),
      (1L, "unique one pp qq rr ss tt"),
      (2L, "unique two aa bb cc dd ee"),
      (4L, "unique four ff gg hh ii jj"),
      (5L, "unique five kk ll mm nn oo")).toDF("doc_id", "text")
    def slices = (0L to 2L).map(e => docs.filter(col("doc_id") % 3 === e))
    def admittedOf(base: String): Set[Long] =
      BatchStore.read(spark, s"$base/kept").select(col("doc_id"))
        .collect().map(_.getLong(0)).toSet
    def run(body: (String, Seq[org.apache.spark.sql.DataFrame]) => Unit)
        : Set[Long] = {
      val base = tmp("graft_ndadmit")
      try { body(base, slices); admittedOf(base) } finally rm(base)
    }
    def fold(base: String, sl: Seq[org.apache.spark.sql.DataFrame]): Unit =
      sl.zipWithIndex.foreach { case (s0, i) =>
        Dedup.nearDupAdmitSlice(spark, s0, "doc_id", "text", k = 16,
          shingleN = 3, bands = 8, threshold = 0.5,
          s"$base/sig", s"$base/kept", 1L + i)
      }
    val folded = run(fold)
    // planted relations: 11 admitted (epoch 2's 10... wait: 10%3=1,
    // 11%3=2 — epoch-1's 10 admits, epoch-2's 11 is the exact dup;
    // 21%3=0 admits, 20%3=2 near-dups against it; 30/33 share epoch
    // 0 — min id 30 keeps
    assert(!folded.contains(11L) && folded.contains(10L),
      s"exact dup across epochs must lose: $folded")
    assert(!folded.contains(20L) && folded.contains(21L),
      s"near dup across epochs must lose: $folded")
    assert(!folded.contains(33L) && folded.contains(30L),
      s"in-slice exact keeper is min id: $folded")
    assert(Set(1L, 2L, 4L, 5L).subsetOf(folded), folded.toString)
    // replay of a committed epoch no-ops (no duplicate kept rows)
    val replayed = run { (base, sl) =>
      fold(base, sl)
      Dedup.nearDupAdmitSlice(spark, sl.head, "doc_id", "text", 16, 3, 8,
        0.5, s"$base/sig", s"$base/kept", 1L)
    }
    assert(replayed == folded)
    // crash window: signatures committed, kept batch not — the retry
    // must still commit the FULL epoch-2 survivor set (verdicts read
    // strictly-prior batches, never the epoch's own signatures)
    val healed = run { (base, sl) =>
      fold(base, sl.take(2))
      Dedup.writeSignatureStore(
        sl(2).join(broadcast(Seq(11L, 20L).toDF("doc_id")), Seq("doc_id"),
          "left_anti"),
        "doc_id", "text", 16, 3, s"$base/sig", 3L) // crashed epoch 2
      fold(base, sl) // resubmission: epochs 1-2 no-op, 3 heals
    }
    assert(healed == folded,
      s"crash-window retry diverged: ${healed.diff(folded)} / ${folded.diff(healed)}")
  }

  // ------------------------------------ feature-hashing name guards

  test("FeatureHashing rejects id columns that shadow its internal/output names") {
    import spark.implicits._
    val df = Seq((1L, "a b c")).toDF("bucket", "text")
    val e = intercept[IllegalArgumentException] {
      FeatureHashing.hashedTf(df, "bucket", "text", dim = 8)
    }
    assert(e.getMessage.contains("bucket"), e.getMessage)
    val feats = FeatureHashing.hashedTf(
      Seq((1L, "a b c")).toDF("doc_id", "text"), "doc_id", "text", 8)
    val e2 = intercept[IllegalArgumentException] {
      FeatureHashing.cosineTopK(feats,
        feats.withColumnRenamed("doc_id", "rank"), "doc_id", "rank", k = 1)
    }
    assert(e2.getMessage.contains("rank"), e2.getMessage)
  }
}
