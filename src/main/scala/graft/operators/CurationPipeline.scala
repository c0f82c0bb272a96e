package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** THE END-TO-END STREAMED CURATION DAG — the composition a real
  * 100 TB pretraining pipeline runs continuously, assembled from
  * stages this library already serves individually (each one
  * oracle-gated in isolation):
  *
  *   raw slice → markup strip → boilerplate strip (served from the
  *   persisted line-df store, q216) → exact dedup against the
  *   signature store + in-batch (first-arrival keeper, q132/q142's
  *   incremental discipline) → quality-classifier gate (q210's
  *   store) → LM perplexity gate at an ABSOLUTE cut (the streamed
  *   twin of q211 — a per-batch quantile would depend on micro-batch
  *   composition) → deterministic mixture coin → exactly-once kept
  *   shard append.
  *
  * [[processSlice]] is the per-micro-batch body; [[sink]] wraps it in
  * the count-store epoch discipline (batch id = base + epochId,
  * committed epochs no-op on replay) for `foreachBatch`;
  * [[packedShards]] is the post-stream export ([[Packing
  * .packSequences]] over the kept store — packing is corpus-global
  * by design, so it runs on the accumulated store, the daily "pack
  * what landed" job).
  *
  * Slice-order semantics are explicit: the surviving set equals a
  * SEQUENTIAL batch fold over the same slices in the same order
  * (spec-pinned) — dedup keeps first arrival (then min id within a
  * slice); every other gate is per-doc deterministic given the
  * pre-trained stores, so slicing cannot change it.
  *
  * Scale: each stage keeps its own gated shape — the boilerplate
  * strip joins the batch against the (domain, line)-keyed model, the
  * dedup reads only the signature store's digest column and
  * broadcasts the BATCH side (delta-sized, never history-shuffled),
  * the classifier/LM models re-aggregate store deltas (model-sized),
  * and the mixture coin is map-side. No stage shuffles the corpus
  * beyond its own gated plan; the stream adds only the kept append.
  */
object CurationPipeline {

  /** The pipeline's persisted stores: pre-trained models (line-df,
    * quality, LM) plus the two the stream MAINTAINS (signatures,
    * kept). */
  final case class Stores(lineDf: String, quality: String, lm: String,
      signatures: String, kept: String)

  /** Gate constants: boilerplate df threshold, classifier feature
    * buckets, the label the classifier must assign to keep a doc,
    * the absolute LM cut, and the deterministic mixture predicate
    * (a Column over the batch's columns — e.g. a [[TextFunctions
    * .hash60]] coin keyed on (domain, id) with per-domain rates). */
  final case class Gates(minDf: Long, buckets: Int, keepLabel: String,
      lmCutAvgFp: Double, mixKeep: Column)

  private def hasBatches(spark: SparkSession, root: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(root)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    fs.exists(p) && fs.listStatus(p).exists(st =>
      st.isDirectory && st.getPath.getName.startsWith("batch="))
  }

  /** Run one slice through every gate and commit its survivors (and
    * their signatures) as batch `batchId` — idempotent: an epoch
    * whose kept batch is already committed no-ops entirely (the
    * exactly-once replay discipline every store sink here shares). */
  def processSlice(spark: SparkSession, st: Stores, gates: Gates,
      batch: DataFrame, idCol: String, domainCol: String, textCol: String,
      batchId: Long): Unit = {
    val keptDir = new org.apache.hadoop.fs.Path(st.kept, s"batch=$batchId")
    val fs = keptDir.getFileSystem(spark.sessionState.newHadoopConf())
    if (fs.exists(keptDir)) return // replayed epoch: already committed

    // 1. markup + boilerplate strip served from the line-df store
    val stripped = Boilerplate.stripRepeatedLinesFromStore(spark, st.lineDf,
      batch.withColumn(textCol, Boilerplate.stripMarkup(col(textCol))),
      idCol, domainCol, textCol, gates.minDf)

    // 2. exact dedup: against the signature store (history = all
    // prior epochs), then first-min-id within the batch; the batch
    // pins once — it feeds the store anti-join, the window, and the
    // downstream gates
    val hashed = stripped.withColumn("__chash", md5(col(textCol)))
      .localCheckpoint()
    val vsStore =
      if (!hasBatches(spark, st.signatures)) hashed
      else hashed.join(
        Dedup.readSignatureStore(spark, st.signatures)
          .select(col("chash").as("__chash")).distinct(),
        Seq("__chash"), "left_anti")
    val keeper = Window.partitionBy(col("__chash"))
    val kept = vsStore
      .withColumn("__keep", min(col(idCol)).over(keeper))
      .filter(col(idCol) === col("__keep"))
      .drop("__chash", "__keep")

    // 3. the new content's signatures join the store BEFORE the
    // quality gates — dedup is about having SEEN content, not about
    // having kept it (a rejected doc's re-crawl must not re-enter).
    // Guarded for the crash-between-commits replay window: a retry
    // that already committed its signatures but not its kept batch
    // must no-op here and still commit the kept batch below.
    val sigDir = new org.apache.hadoop.fs.Path(st.signatures,
      s"batch=$batchId")
    if (!fs.exists(sigDir))
      Dedup.writeSignatureStore(kept, idCol, textCol, k = 4, shingleN = 3,
        root = st.signatures, batchId = batchId)

    // 4. classifier gate (model re-aggregated from the store's deltas)
    val good = QualityClassifier.classifyFromStore(spark, st.quality,
        kept, idCol, textCol, gates.buckets)
      .filter(col("label_pred") === gates.keepLabel)
      .select(col(idCol))
    val keptGood = kept.join(good, Seq(idCol))

    // 5. LM perplexity gate at the absolute cut
    val lmOk = LanguageModel.lmThresholdFilterFromStore(spark, st.lm,
      keptGood, idCol, textCol, gates.lmCutAvgFp)
    val survivors = keptGood.join(lmOk.select(col(idCol)), Seq(idCol))

    // 6. deterministic mixture coin, then the exactly-once commit
    BatchStore.append(
      survivors.filter(gates.mixKeep)
        .select(col(idCol), col(domainCol), col(textCol)),
      st.kept, batchId)
    Checkpoints.releasePinned(lmOk)
    Checkpoints.releasePinned(hashed)
  }

  /** [[processSlice]] as a `foreachBatch` sink — batch id = `base +
    * epochId`, the exactly-once epoch discipline shared by every
    * store sink in the library. */
  def sink(st: Stores, gates: Gates, idCol: String, domainCol: String,
      textCol: String, baseBatchId: Long = 1L): (DataFrame, Long) => Unit =
    (batch, epochId) => processSlice(batch.sparkSession, st, gates,
      batch, idCol, domainCol, textCol, baseBatchId + epochId)

  /** The post-stream export: [[Packing.packSequences]] over the
    * accumulated kept store, summarized per shard. Packing is
    * corpus-global (a doc's sequence offset depends on every doc in
    * its shard), so it runs on the store, not per epoch. */
  def packedShards(spark: SparkSession, st: Stores, idCol: String,
      textCol: String, shards: Int, budgetTokens: Long): DataFrame =
    Packing.packSequences(BatchStore.read(spark, st.kept), idCol, textCol,
        shards, budgetTokens)
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("seq_id")).as("n_seqs"),
        sum(col("n_tokens")).as("sum_tokens"),
        sum(when(col("straddles"), 1L).otherwise(0L)).as("n_straddles"))
      .orderBy(col("shard"))
}
