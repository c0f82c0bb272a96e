package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.BatchStore

/** Round-15: store as-of reads (reproducible historical rebuilds with
  * directory-level pruning), prototype pruning over embeddings, the
  * epoch-deterministic reshuffle, and the curation DAG's per-doc
  * disposition ledger + funnel.
  */
class Round15Spec extends AnyFunSuite {
  lazy val spark = Sessions.local(4)

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private def rm(root: String): Unit =
    new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sessionState.newHadoopConf())
      .delete(new org.apache.hadoop.fs.Path(root), true)

  private def scansOf(p: org.apache.spark.sql.execution.SparkPlan)
      : Seq[org.apache.spark.sql.execution.FileSourceScanExec] = p.collect {
    case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
      scansOf(a.executedPlan)
    case f: org.apache.spark.sql.execution.FileSourceScanExec => Seq(f)
  }.flatten

  // ------------------------------------------------ store as-of read

  test("readAsOf serves exactly the <=k batches and prunes at the directory level") {
    import spark.implicits._
    val root = tmp("graft_asof")
    try {
      Seq.tabulate(3) { i =>
        Seq((i.toLong * 10, s"doc$i")).toDF("id", "payload")
      }.zipWithIndex.foreach { case (df, i) =>
        BatchStore.append(df, root, batchId = i + 1L)
      }
      val asOf2 = BatchStore.readAsOf(spark, root, 2L)
      assert(asOf2.select("id").as[Long].collect().sorted.toSeq ===
        Seq(0L, 10L))
      // the pruning pin: the scan's file index selects 2 of 3
      // partition dirs — the batch<=2 predicate is a PartitionFilter,
      // never a post-scan filter over the full store
      val scan = scansOf(asOf2.queryExecution.executedPlan)
        .find(_.metadata.get("Location").exists(_.contains("graft_asof")))
      assert(scan.isDefined)
      assert(scan.get.selectedPartitions.partitionCount === 2,
        s"as-of 2 must list 2 of 3 batch dirs, listed " +
          s"${scan.get.selectedPartitions.partitionCount}")
      // live read still sees everything
      assert(BatchStore.read(spark, root).count() === 3)
    } finally rm(root)
  }

  // ------------------------------------------------- epoch reshuffle

  test("epoch reshuffle: shard assignment is seed-stable, the permutation is not, layout is irrelevant") {
    import spark.implicits._
    import graft.operators.Packing
    val docs = (0L until 200L)
      .map(i => (i, Seq.fill((i % 7 + 1).toInt)(s"t$i").mkString(" ")))
      .toDF("doc_id", "text")
    def pack(df: org.apache.spark.sql.DataFrame, seed: String) =
      Packing.packSequences(df, "doc_id", "text", shards = 4,
          budgetTokens = 16, epochSeed = seed)
        .select("doc_id", "shard", "seq_id", "seq_offset")
        .collect().map(r => r.getLong(0) ->
          (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val e0 = pack(docs, "e0")
    val e1 = pack(docs, "e1")
    // shards identical across epochs (locality stable)...
    assert((0L until 200L).forall(i => e0(i)._1 == e1(i)._1),
      "shard assignment must be seed-independent")
    // ...but the within-shard permutation re-deals
    assert((0L until 200L).exists(i => e0(i) != e1(i)),
      "different seeds must produce a different sequence layout")
    // pure function of (id, seed): any input partitioning packs the same
    val e0b = pack(docs.repartition(13, col("text")), "e0")
    assert(e0 == e0b, "packing must be input-layout-invariant")
    // empty seed stays byte-identical to the historical layout
    assert(pack(docs, "") == pack(docs.repartition(7), ""))
  }

  // ------------------------------------------------ prototype pruning

  test("prototypePrune matches a naive driver-side reference on random vectors") {
    import spark.implicits._
    import graft.operators.Similarity
    val rnd = new scala.util.Random(1551)
    val vecs = (0L until 120L).map(i =>
      (i, Array.fill(8)(rnd.nextFloat() * 2f - 1f))).toSeq
    val df = vecs.toDF("vec_id", "embedding")
    val seeds = df.filter(col("vec_id") < 5)
    val got = Similarity.prototypePrune(df, seeds, "vec_id", "embedding",
        keepFrac = 0.4)
      .select("vec_id", "centroid_id", "proto_rank", "n_members")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet
    // naive reference
    def cos(a: Array[Float], b: Array[Float]): Double = {
      def dot(x: Array[Float], y: Array[Float]) =
        x.indices.foldLeft(0.0)((s, i) => s + x(i).toDouble * y(i).toDouble)
      dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b)))
    }
    val cents = vecs.filter(_._1 < 5)
    val assigned = vecs.map { case (id, v) =>
      val (cid, c) = cents.map { case (cid, cv) => (cid, cos(v, cv)) }
        .minBy { case (cid, c) => (-c, cid) }
      (id, cid, c)
    }
    val expect = assigned.groupBy(_._2).flatMap { case (cid, members) =>
      val ranked = members.sortBy { case (id, _, c) => (c, id) }.zipWithIndex
      val keep = math.ceil(0.4 * members.size).toLong
      ranked.filter(_._2 < keep).map { case ((id, _, _), rk) =>
        (id, cid, rk + 1L, members.size.toLong)
      }
    }.toSet
    assert(got == expect,
      s"missing=${expect.diff(got).take(5)} extra=${got.diff(expect).take(5)}")
  }

  // -------------------------------------------- feature hashing

  test("hashedTf + cosineTopK match a naive driver-side reference on random corpora") {
    import spark.implicits._
    import graft.operators.FeatureHashing
    def md5_60(s: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      java.lang.Long.parseLong(
        d.take(8).map(b => f"$b%02x").mkString.take(15), 16)
    }
    val dim = 16 // small so buckets collide and signs cancel
    val rnd = new scala.util.Random(1552)
    val vocab = (0 until 30).map(i => s"w$i")
    def text() = Seq.fill(rnd.nextInt(40) + 1)(
      vocab(rnd.nextInt(vocab.size))).mkString(" ")
    val corpus = (0L until 50L).map(i => (i, text()))
    val queries = (100L until 104L).map(i => (i, text()))
    def feats(docs: Seq[(Long, String)]): Map[(Long, Long), Long] =
      docs.flatMap { case (id, t) =>
        t.trim.split("\\s+").filter(_.nonEmpty).map { tok =>
          ((id, math.floorMod(md5_60(tok), dim.toLong)),
            if (math.floorMod(md5_60("s:" + tok), 2L) == 0) 1L else -1L)
        }
      }.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
        .filter(_._2 != 0L)
    val cF = feats(corpus); val qF = feats(queries)
    // operator side
    val gotF = FeatureHashing.hashedTf(corpus.toDF("id", "text"),
        "id", "text", dim)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    assert(gotF == cF, "hashedTf must equal the naive signed counts")
    // full retrieval
    val got = FeatureHashing.cosineTopK(
        FeatureHashing.hashedTf(corpus.toDF("cid", "text"), "cid", "text", dim),
        FeatureHashing.hashedTf(queries.toDF("qid", "text"), "qid", "text", dim),
        "cid", "qid", k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    def norm2(f: Map[(Long, Long), Long], id: Long) =
      f.collect { case ((i, _), w) if i == id => w * w }.sum
    def buckets(f: Map[(Long, Long), Long], id: Long) =
      f.keys.collect { case (i, b) if i == id => b }.toSet
    val expect = queries.map(_._1).flatMap { q =>
      // a pair exists iff it SHARES >= 1 bucket (join semantics) —
      // cross-bucket cancellation to dot 0 still yields a row
      val scoredAll = corpus.map(_._1).flatMap { c =>
        if (buckets(cF, c).intersect(buckets(qF, q)).isEmpty) None
        else {
          val dot = (0L until dim.toLong).map(b =>
            cF.getOrElse((c, b), 0L) * qF.getOrElse((q, b), 0L)).sum
          Some((c, dot.toDouble /
            (math.sqrt(norm2(cF, c).toDouble)
              * math.sqrt(norm2(qF, q).toDouble))))
        }
      }
      scoredAll.sortBy { case (c, cos) => (-cos, c) }.take(3)
        .zipWithIndex.map { case ((c, _), i) => (q, i + 1L, c) }
    }.toSet
    assert(got == expect,
      s"missing=${expect.diff(got).take(5)} extra=${got.diff(expect).take(5)}")
  }

  test("hashed store: dim meta guards mismatched writes/serves and legacy roots; erased ids never rank") {
    import spark.implicits._
    import graft.operators.{BatchStore, FeatureHashing => FH}
    val root = tmp("graft_hstore")
    try {
      val corpus = Seq((10L, "alpha beta gamma"), (11L, "alpha beta"),
        (12L, "delta epsilon zeta")).toDF("doc_id", "text")
      FH.writeHashedStore(corpus.filter(col("doc_id") <= 11),
        "doc_id", "text", dim = 64, root, 1L)
      // a mismatched dim fails loudly — it would otherwise silently
      // score zero overlap
      val e = intercept[IllegalArgumentException] {
        FH.writeHashedStore(corpus.filter(col("doc_id") === 12L),
          "doc_id", "text", dim = 128, root, 2L)
      }
      assert(e.getMessage.contains("dim=64"), e.getMessage)
      FH.writeHashedStore(corpus.filter(col("doc_id") === 12L),
        "doc_id", "text", dim = 64, root, 2L)
      val q = Seq((1L, "alpha beta gamma")).toDF("query_id", "text")
      val served = FH.hashedTopKFromStore(spark, root, q,
        "query_id", "text", "doc_id", k = 3)
      val ranked = served.orderBy(col("rank"))
        .select("doc_id").as[Long].collect().toSeq
      // identical text scores cosine 1.0 — rank 1 must be doc 10
      assert(ranked.headOption.contains(10L) && ranked.contains(11L), ranked)
      graft.operators.Checkpoints.releasePinned(served)
      // erasure: tombstoned doc never ranks again, purge is physical
      FH.deleteFromHashedStore(Seq(10L).toDF("doc_id"), "doc_id", root, 3L)
      val masked = FH.hashedTopKFromStore(spark, root, q,
        "query_id", "text", "doc_id", k = 3)
      assert(!masked.select("doc_id").as[Long].collect().contains(10L))
      graft.operators.Checkpoints.releasePinned(masked)
      FH.purgeHashedStore(spark, root, "doc_id", newBatchId = 4L)
      assert(BatchStore.read(spark, root)
        .filter(col("doc_id") === 10L).count() == 0)
      // a legacy root (batches, no meta) refuses new-meta creation
      val legacy = tmp("graft_hstore_legacy")
      try {
        BatchStore.append(Seq((1L, 0L, 1L)).toDF("doc_id", "bucket", "weight"),
          legacy, 1L)
        val e2 = intercept[IllegalArgumentException] {
          FH.writeHashedStore(corpus, "doc_id", "text", 64, legacy, 2L)
        }
        assert(e2.getMessage.contains("legacy"), e2.getMessage)
      } finally rm(legacy)
    } finally rm(root)
  }

  // -------------------------------------------- incremental packing

  test("packIncrement: sequential-fold layout, replay no-op, crash heal, no history rescan") {
    import spark.implicits._
    import graft.operators.{BatchStore, Packing}
    val root = tmp("graft_incpack")
    try {
      val docs = (0L until 60L).map(i =>
        (i, Seq.fill((i % 9 + 1).toInt)(s"t$i").mkString(" ")))
        .toDF("doc_id", "text")
      def slice(e: Int) = docs.filter(col("doc_id") % 3 === e)
      (0 to 1).foreach(e => Packing.packIncrement(slice(e), "doc_id",
        "text", shards = 4, budgetTokens = 32, root, batchId = 1L + e))
      // the third append must read the sidecar, not the 40-row history
      val (_, m) = Metrics.capture(spark) {
        Packing.packIncrement(slice(2), "doc_id", "text", shards = 4,
          budgetTokens = 32, root, batchId = 3L)
      }
      assert(m.inputRecords < 40,
        s"append must not rescan history: read ${m.inputRecords} records")
      // layout == ONE window ordered by (epoch, hash, id) within shard
      val got = BatchStore.read(spark, root)
        .select("doc_id", "shard", "seq_id", "seq_offset")
        .collect().map(r => r.getLong(0) ->
          (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("shard"))
        .orderBy(col("__e"), graft.operators.TextFunctions.hash60(
          col("doc_id").cast("string")), col("doc_id").cast("string"))
        .rowsBetween(org.apache.spark.sql.expressions.Window
          .unboundedPreceding, -1)
      val ref = docs
        .withColumn("__e", col("doc_id") % 3)
        .withColumn("shard", pmod(graft.operators.TextFunctions.hash60(
          col("doc_id").cast("string")), lit(4L)))
        .withColumn("n_tokens", size(graft.operators.TextFunctions
          .tokens(col("text"))).cast("long"))
        .withColumn("cum", coalesce(sum(col("n_tokens")).over(w), lit(0L)))
        .select(col("doc_id"), col("shard"),
          expr("cum DIV 32").as("seq_id"), (col("cum") % 32).as("seq_offset"))
        .collect().map(r => r.getLong(0) ->
          (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
      assert(got == ref, "fold must equal the one-window reference")
      // replay: both commits exist → complete no-op
      Packing.packIncrement(slice(2), "doc_id", "text", 4, 32, root, 3L)
      assert(BatchStore.read(spark, root).count() === 60)
      // crash heal: offsets snapshot missing for the last batch —
      // the NEXT append re-derives base excluding nothing it
      // shouldn't, and a REPLAY of the crashed batch heals its
      // own sidecar without double-counting
      val fs = new org.apache.hadoop.fs.Path(root)
        .getFileSystem(spark.sessionState.newHadoopConf())
      fs.delete(new org.apache.hadoop.fs.Path(root, "_offsets/batch=3"), true)
      Packing.packIncrement(slice(2), "doc_id", "text", 4, 32, root, 3L)
      val healed = spark.read.parquet(s"$root/_offsets/batch=3")
        .select(col("shard"), col("total_tokens"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val truth = BatchStore.read(spark, root).groupBy(col("shard"))
        .agg(sum(col("n_tokens")).as("t")).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(healed == truth,
        s"healed sidecar must equal store totals: $healed vs $truth")
      // a FRESH batch id below the committed max refuses (a replayed
      // committed id is a no-op, but a new out-of-order id would
      // re-base committed layout)
      val e = intercept[IllegalArgumentException] {
        Packing.packIncrement(slice(0), "doc_id", "text", 4, 32, root, 0L)
      }
      assert(e.getMessage.contains("monotone"), e.getMessage)
    } finally rm(root)
  }

  // -------------------------------------------- store schema evolution

  test("schema drift: strict compact fails loudly; compactEvolved null-fills and makes the schema physical") {
    import spark.implicits._
    val root = tmp("graft_evo")
    try {
      BatchStore.append(Seq((1L, 10L)).toDF("id", "n"), root, 1L)
      BatchStore.append(Seq((2L, 20L, "en")).toDF("id", "n", "lang"),
        root, 2L)
      // the default compact refuses the drifted store — silent
      // null-filling would turn an upstream bug into data corruption
      intercept[org.apache.spark.sql.AnalysisException] {
        BatchStore.compact(spark, root, newBatchId = 3L)
      }
      // evolution is opt-in: merged, null-filled, physically unified
      assert(BatchStore.compactEvolved(spark, root, newBatchId = 3L) == 2)
      val after = BatchStore.read(spark, root)
      assert(after.columns.toSet == Set("id", "n", "lang", "batch"))
      val rows = after.select("id", "lang").collect()
        .map(r => (r.getLong(0), Option(r.getString(1)))).toSet
      assert(rows == Set((1L, None), (2L, Some("en"))),
        s"pre-evolution rows must null-fill: ${rows.mkString(",")}")
    } finally rm(root)
  }

  test("readAsOf below the oldest surviving batch fails loudly after compaction") {
    import spark.implicits._
    val root = tmp("graft_asof_compact")
    try {
      BatchStore.append(Seq((1L, "a")).toDF("id", "p"), root, 1L)
      BatchStore.append(Seq((2L, "b")).toDF("id", "p"), root, 2L)
      BatchStore.compact(spark, root, newBatchId = 3L)
      val e = intercept[IllegalArgumentException] {
        BatchStore.readAsOf(spark, root, 2L)
      }
      assert(e.getMessage.contains("compacted away"), e.getMessage)
      // as-of at/above the surviving batch still serves
      assert(BatchStore.readAsOf(spark, root, 3L).count() === 2)
    } finally rm(root)
  }
}
