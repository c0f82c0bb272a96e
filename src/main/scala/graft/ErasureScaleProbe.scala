package graft

import org.apache.spark.sql.functions._

import graft.operators.{Checkpoints, InvertedIndex, LanguageModel}

/** Reproducible driver behind SCALE.md's erasure-cost table: pins the
  * claim "masking cost ∝ accumulated deletes, never store size" with
  * measured serve times at increasing delete volumes on the two
  * tombstone/delta-served stores:
  *
  *  - POSTING store: build once, then time the served BM25 search at
  *    0 deletes, ~1% deleted, ~11% deleted (two tombstone batches) —
  *    the mask is an anti-join whose left side is the query's
  *    term-pruned rows and whose right side is delete-volume-sized,
  *    so the serve delta must track the TOMBSTONE count, not the
  *    store; running the probe on two dirs (10× corpus) shows the
  *    store-size axis separately.
  *  - LM store: build once, then time served scoring at the same
  *    three delete volumes — erasure is an appended NEGATED-count
  *    batch, so each serve pays one keyed re-aggregate over
  *    (store + delete-volume-sized delta rows).
  *  - TOKEN index (late-interaction): build once over the chunked
  *    corpus, then time the MaxSim serve on a FIXED candidate set at
  *    the same three delete volumes — the mask is the shared
  *    tombstone anti-join applied after the candidate filter, so the
  *    serve delta must track the tombstone count, not the index.
  *
  * `runMain graft.ErasureScaleProbe <dir1> [dir2 ...]` prints one
  * `ERASE <dir> <label> <median>s [runs]` line per measurement.
  */
object ErasureScaleProbe {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: ErasureScaleProbe <dir1> [dir2 ...]")
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt)
    def rm(root: String): Unit = {
      val p = new org.apache.hadoop.fs.Path(root)
      p.getFileSystem(spark.sessionState.newHadoopConf()).delete(p, true)
    }
    def time(dir: String, label: String)(f: => Unit): Unit = {
      def run(): Double = {
        Bench.isolate(spark)
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      run() // warmup
      val ts = (1 to 3).map(_ => run()).sorted
      println(f"ERASE $dir $label ${ts(1)}%.3f s  " +
        ts.map(t => f"$t%.3f").mkString("[", ",", "]"))
    }
    args.foreach { dir =>
      // NO checkpoints anywhere in this probe: time() runs
      // Bench.isolate, which sweeps every persistent block — a pinned
      // frame consumed inside (or after) a timed region would die
      // with CHECKPOINT_RDD_BLOCK_ID_NOT_FOUND. Recomputation is
      // constant across the three delete volumes, so the DELTA (the
      // claim under test) is unaffected.
      val docs = Tables.documents(spark, dir)

      // ---- posting store: serve cost vs tombstone volume
      val proot = java.nio.file.Files
        .createTempDirectory("graft_eraseprobe_post").toString
      InvertedIndex.writePostingStore(docs, "doc_id", "text", proot, 1L)
      val terms = graft.operators.BatchStore.read(spark, proot)
        .groupBy(col("token")).agg(sum(col("tf")).as("cf"))
        .orderBy(desc("cf"), col("token")).limit(2)
        .collect().map(_.getString(0)).toSeq
      def serve(): Unit =
        InvertedIndex.bm25SearchFromStore(spark, proot, "doc_id", terms, 10)
          .count()
      time(dir, "bm25_serve_del0")(serve())
      // ~1% of docs tombstoned (doc_id % 100 = 7)
      InvertedIndex.deleteFromPostingStore(
        docs.filter(col("doc_id") % 100 === 7), "doc_id", "text", proot, 2L)
      time(dir, "bm25_serve_del1pct")(serve())
      // +10% more (doc_id % 10 = 3 — disjoint from the first batch)
      InvertedIndex.deleteFromPostingStore(
        docs.filter(col("doc_id") % 10 === 3), "doc_id", "text", proot, 3L)
      time(dir, "bm25_serve_del11pct")(serve())
      rm(proot)

      // ---- LM store: serve cost vs negated-delta volume
      val lroot = java.nio.file.Files
        .createTempDirectory("graft_eraseprobe_lm").toString
      LanguageModel.writeLmStore(docs, "doc_id", "text", lroot, 1L)
      val cand = docs.filter(col("doc_id") % 50 === 1)
      def lmServe(): Unit = {
        val r = LanguageModel.bigramLmScoreFromStore(
          spark, lroot, cand, "doc_id", "text", k = 20)
        r.count()
        Checkpoints.releasePinned(r)
      }
      time(dir, "lm_serve_del0")(lmServe())
      LanguageModel.deleteFromLmStore(
        docs.filter(col("doc_id") % 100 === 7), "doc_id", "text", lroot, 2L)
      time(dir, "lm_serve_del1pct")(lmServe())
      LanguageModel.deleteFromLmStore(
        docs.filter(col("doc_id") % 10 === 3), "doc_id", "text", lroot, 3L)
      time(dir, "lm_serve_del11pct")(lmServe())
      rm(lroot)

      // ---- token index: MaxSim serve cost vs tombstone volume —
      // fixed candidate pairs (every query × 10 fixed passages), so
      // the only moving part across the three measurements is the
      // tombstone anti-join after the candidate filter
      val troot = java.nio.file.Files
        .createTempDirectory("graft_eraseprobe_ti").toString
      val chunks = graft.operators.Chunking
        .chunkByTokens(docs, "doc_id", "text", 64, 48)
        .select((col("doc_id") * lit(1048576L) + col("chunk_id"))
          .as("neighbor_id"), col("chunk_text").as("text"))
      graft.operators.LateInteraction.writeTokenIndex(
        chunks, "neighbor_id", "text", dim = 16, troot, batchId = 1L)
      val qs = docs.filter(col("doc_id") % 97 === 3)
        .select(col("doc_id").as("query_id"), col("text"))
      val tcand = qs.select(col("query_id")).crossJoin(
          chunks.select(col("neighbor_id"))
            .orderBy(col("neighbor_id")).limit(10))
      def tiServe(): Unit = {
        val r = graft.operators.LateInteraction.maxSimFromTokenIndex(
          spark, troot, tcand, qs, "query_id", "neighbor_id", "text",
          dim = 16, maxQueryTokens = 16, k = 5)
        r.count()
        Checkpoints.releasePinned(r)
      }
      time(dir, "maxsim_serve_del0")(tiServe())
      graft.operators.LateInteraction.deleteFromTokenIndex(
        chunks.filter(col("neighbor_id") % 100 === 7)
          .select(col("neighbor_id")), "neighbor_id", troot, 2L)
      time(dir, "maxsim_serve_del1pct")(tiServe())
      graft.operators.LateInteraction.deleteFromTokenIndex(
        chunks.filter(col("neighbor_id") % 10 === 3)
          .select(col("neighbor_id")), "neighbor_id", troot, 3L)
      time(dir, "maxsim_serve_del11pct")(tiServe())
      rm(troot)
    }
    spark.stop()
  }
}
