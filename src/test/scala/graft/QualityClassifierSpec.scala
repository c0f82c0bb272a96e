package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.QualityClassifier

/** Round-14: the trained quality classifier — DISCRIMINATION on a
  * fixture whose classes actually differ (the synthetic corpus gate
  * q210 pins arithmetic, not separability — the q185 rule), the
  * store lifecycle (erase = retrain-identity; compaction guard), and
  * the checkpoint contract.
  */
class QualityClassifierSpec extends AnyFunSuite {
  lazy val spark = Sessions.local(4)

  // two genuinely different token distributions
  private def goodDoc(i: Int) =
    s"the quick brown fox jumps over the lazy dog chapter $i verse"
  private def badDoc(i: Int) =
    s"click here buy now free offer $i limited deal click click"

  private def train = {
    import spark.implicits._
    ((1 to 10).map(i => ("good", goodDoc(i))) ++
      (1 to 10).map(i => ("bad", badDoc(i)))).toDF("label", "text")
  }

  test("classifies held-out docs of each distribution correctly; zero-token docs are absent") {
    import spark.implicits._
    val counts = QualityClassifier.featureCounts(train, "label", "text", 1024)
    val cand = Seq(
      (1L, goodDoc(99)), (2L, badDoc(99)), (3L, "   ")).toDF("doc_id", "text")
    val got = QualityClassifier.classify(cand, counts, "doc_id", "text", 1024)
    val preds = got.select(col("doc_id"), col("label_pred"))
      .as[(Long, String)].collect().toMap
    graft.operators.Checkpoints.releasePinned(got)
    assert(preds == Map(1L -> "good", 2L -> "bad"),
      s"held-out docs must classify by their distribution: $preds")
  }

  test("store lifecycle: erase equals retraining without the erased docs; double-delete fails compaction loudly") {
    import spark.implicits._
    val root = java.nio.file.Files
      .createTempDirectory("graft_qc_store").toString
    val t = train.withColumn("rid", monotonically_increasing_id())
    QualityClassifier.writeQualityStore(t, "label", "text", 1024, root, 1L)
    // erase half the bad docs; serving must equal a model that never
    // saw them
    val erased = t.filter(col("label") === "bad" && col("rid") % 2 === 0)
    QualityClassifier.deleteFromQualityStore(erased,
      "label", "text", 1024, root, 2L)
    val cand = Seq((1L, goodDoc(7)), (2L, badDoc(7))).toDF("doc_id", "text")
    val served = QualityClassifier.classifyFromStore(spark, root,
      cand, "doc_id", "text", 1024)
    val retrained = QualityClassifier.classify(cand,
      QualityClassifier.featureCounts(
        t.join(erased.select(col("rid")), Seq("rid"), "left_anti"),
        "label", "text", 1024),
      "doc_id", "text", 1024)
    assert(served.orderBy(col("doc_id")).collect().toSeq ==
      retrained.orderBy(col("doc_id")).collect().toSeq,
      "erased store must serve exactly like a retrained model")
    // compaction folds cleanly once...
    assert(QualityClassifier.compactQualityStore(spark, root, 3L) == 2)
    // ...but a second delete of the SAME docs nets negative and the
    // guard must fire at the next compaction
    QualityClassifier.deleteFromQualityStore(erased,
      "label", "text", 1024, root, 4L)
    val e = intercept[Exception] {
      QualityClassifier.compactQualityStore(spark, root, 5L)
    }
    assert(e.getMessage != null && e.getMessage.contains("negative net count"),
      s"double-delete must fail the compaction: ${e.getMessage}")
    Seq(served, retrained).foreach(graft.operators.Checkpoints.releasePinned)
    new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sessionState.newHadoopConf())
      .delete(new org.apache.hadoop.fs.Path(root), true)
  }

  test("qualityStoreSink: epoch replay is a no-op") {
    import spark.implicits._
    val root = java.nio.file.Files
      .createTempDirectory("graft_qc_sink").toString
    val b0 = Seq(("good", goodDoc(1)), ("bad", badDoc(1))).toDF("label", "text")
    val b1 = Seq(("good", goodDoc(2))).toDF("label", "text")
    val sink = QualityClassifier.qualityStoreSink("label", "text", 256, root)
    sink(b0, 0L); sink(b1, 1L)
    def stored() = graft.operators.BatchStore.read(spark, root)
      .orderBy(col("batch"), col("label"), col("bucket"))
      .collect().toSeq
    val s0 = stored()
    assert(s0.nonEmpty)
    sink(b0, 0L); sink(b1, 1L)
    assert(stored() == s0, "epoch replay must be a no-op")
    new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sessionState.newHadoopConf())
      .delete(new org.apache.hadoop.fs.Path(root), true)
  }

  test("each call releases its internal pins") {
    import spark.implicits._
    // id-set delta, not a count: the ContextCleaner may async-drop a
    // dead pin from an earlier test between captures (count flake)
    def pinnedIds: Set[Int] = spark.sparkContext.getPersistentRDDs.keySet.toSet
    val counts = QualityClassifier.featureCounts(train, "label", "text", 256)
    val cand = Seq((1L, goodDoc(3))).toDF("doc_id", "text")
    val before = pinnedIds
    val out = QualityClassifier.classify(cand, counts, "doc_id", "text", 256)
    out.count()
    assert((pinnedIds -- before).size == 1,
      "after a call, only the returned frame may be pinned")
    graft.operators.Checkpoints.releasePinned(out)
    assert((pinnedIds -- before).isEmpty, "release must drop the last pin")
  }
}
