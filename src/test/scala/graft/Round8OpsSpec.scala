package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Dedup, Packing, Sampling}

/** Round-8 curation operators: the leakage-safe group split and the
  * distributed global prefix-sum sharding.
  */
class Round8OpsSpec extends AnyFunSuite {
  lazy val spark = Sessions.local(4)
  private val sf = "/root/testdata/sf0.001"

  // ----------------------------------------------------- groupSplit

  test("groupSplit: near-dup pairs and whole clusters never straddle a cut") {
    val docs = Tables.documents(spark, sf)
    val pairs = Dedup.minhashLshPairs(docs, "doc_id", "text",
      k = 16, shingleN = 3, bands = 8, threshold = 0.5)
    val comp = Dedup.connectedComponents(pairs).withColumnRenamed("node", "doc_id")
    val labeled = docs.select(col("doc_id"))
      .join(comp, Seq("doc_id"), "left")
      .withColumn("grp", coalesce(col("component"), col("doc_id")))
    val split = Sampling.groupSplit(labeled, col("grp"),
      Seq(("val", 5), ("test", 10), ("train", 100)))

    // cluster-level: one split per cluster
    val spanning = split.groupBy("grp")
      .agg(countDistinct(col("split")).as("n"))
      .filter(col("n") > 1).count()
    assert(spanning == 0, "a cluster straddles a split cut")

    // pair-level (transitively implied, pinned directly): both ends of
    // every verified near-dup pair land on the same side
    val sa = split.select(col("doc_id").as("id_a"), col("split").as("sa"))
    val sb = split.select(col("doc_id").as("id_b"), col("split").as("sb"))
    val leaked = pairs.join(sa, "id_a").join(sb, "id_b")
      .filter(col("sa") =!= col("sb")).count()
    assert(leaked == 0, "a near-dup pair straddles train/test")

    // all three splits materialize and partition the corpus
    val bySplit = split.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySplit.keySet == Set("train", "val", "test"), bySplit)
    assert(bySplit.values.sum == docs.count())
  }

  test("groupSplit is a map-side projection: no exchange in the plan") {
    val docs = Tables.documents(spark, sf).select(col("doc_id"), col("lang"))
    val p = Sampling.groupSplit(docs, col("lang"), Seq(("a", 50), ("b", 100)))
      .queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), p)
  }

  test("groupSplit rejects malformed cuts") {
    val docs = Tables.documents(spark, sf).select(col("doc_id"))
    intercept[IllegalArgumentException] {
      Sampling.groupSplit(docs, col("doc_id"), Seq(("a", 50), ("b", 99)))
    }
    intercept[IllegalArgumentException] {
      Sampling.groupSplit(docs, col("doc_id"), Seq(("a", 60), ("b", 50), ("c", 100)))
    }
    intercept[IllegalArgumentException] {
      Sampling.groupSplit(docs, col("doc_id"), Seq.empty)
    }
  }

  // ----------------------------------------- contiguousShards

  test("contiguousShards equals the single-task global window exactly") {
    import graft.operators.TextFunctions.tokenCount
    val docs = Tables.documents(spark, sf)
    val got = Packing.contiguousShards(docs, "doc_id", tokenCount(col("text")),
        budget = 500L, buckets = 8)
      .orderBy("doc_id").collect()
    // the naive spelling the operator replaces — fine at test scale
    val naive = docs
      .select(col("doc_id"), tokenCount(col("text")).cast("long").as("n_tokens"))
      .withColumn("global_offset", coalesce(sum(col("n_tokens")).over(
        Window.orderBy(col("doc_id"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("shard", expr("global_offset DIV 500"))
      .orderBy("doc_id").collect()
    assert(got.length == naive.length && got.length > 0)
    got.zip(naive).foreach { case (g, n) => assert(g == n, s"$g != $n") }
  }

  test("contiguousShards: bucket count does not change the result") {
    import graft.operators.TextFunctions.tokenCount
    val docs = Tables.documents(spark, sf)
    def run(b: Int) = Packing.contiguousShards(docs, "doc_id",
      tokenCount(col("text")), budget = 700L, buckets = b)
      .orderBy("doc_id").collect().toSeq
    assert(run(1) == run(7) && run(7) == run(64),
      "shard assignment must be partitioning-independent")
  }

  test("contiguousShards: offsets broadcast back (no corpus-side shuffle join)") {
    import graft.operators.TextFunctions.tokenCount
    val p = Packing.contiguousShards(Tables.documents(spark, sf), "doc_id",
        tokenCount(col("text")), budget = 500L, buckets = 8)
      .queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
    // the corpus-side window is keyed by bucket, never an empty
    // partition spec over the whole corpus
    assert(p.contains("partitionBy") || p.contains("__bucket"), p)
  }

  test("contiguousShards: shards fill to budget, in id order, covering all docs") {
    import graft.operators.TextFunctions.tokenCount
    val docs = Tables.documents(spark, sf)
    val out = Packing.contiguousShards(docs, "doc_id", tokenCount(col("text")),
      budget = 500L, buckets = 8)
    assert(out.count() == docs.count())
    val perShard = out.groupBy("shard").agg(
        sum(col("n_tokens")).as("tok"), min(col("doc_id")).as("lo"),
        max(col("doc_id")).as("hi"))
      .orderBy("shard").collect()
    // contiguity: each shard's id range follows the previous one's
    perShard.sliding(2).foreach {
      case Array(a, b) => assert(a.getLong(2) <= b.getLong(2) && a.getLong(3) < b.getLong(2),
        s"shard ranges overlap: $a vs $b")
      case _ =>
    }
    // every shard except possibly the last crosses its budget boundary
    // only via one straddling doc: tokens >= budget - max_doc_tokens
    val maxDoc = out.agg(max(col("n_tokens"))).head().getLong(0)
    perShard.dropRight(1).foreach { r =>
      assert(r.getLong(1) >= 500L - maxDoc, s"underfull non-final shard: $r")
    }
  }

  // ----------------------------------------- incrementalDedup

  test("incrementalDedup verdicts: exact, near, and novel batch docs") {
    import spark.implicits._
    val history = Seq(
      (1L, "the quick brown fox jumps over the lazy dog tonight"),
      (2L, "completely unrelated history content about spark plans"),
      (3L, "another history document with its own distinct words here"))
      .toDF("doc_id", "text")
    val batch = Seq(
      (10L, "the quick brown fox jumps over the lazy dog tonight"), // exact
      (11L, "the quick brown fox jumps over the lazy dog today"),   // near
      (12L, "nothing like anything the history corpus contains anywhere"))
      .toDF("doc_id", "text")
    val out = graft.operators.Dedup.incrementalDedup(history, batch,
        "doc_id", "text", k = 16, shingleN = 3, bands = 8, threshold = 0.5)
      .orderBy("doc_id").collect()
    assert(out.length == 3)
    val byId = out.map(r => r.getLong(0) ->
      (r.getBoolean(1), r.getLong(2), Option(r.get(3)))).toMap
    assert(byId(10L)._1, "identical text must flag exact")
    assert(byId(10L)._2 >= 1 && byId(10L)._3.contains(1.0),
      "identical text is also a jaccard-1.0 near dup")
    assert(!byId(11L)._1 && byId(11L)._2 >= 1, "one-word edit: near, not exact")
    assert(byId(11L)._3.exists(j => j.asInstanceOf[Double] >= 0.5))
    assert(byId(12L) == ((false, 0L, None)), "novel doc: clean verdicts")
  }

  test("incrementalDedup never shuffle-joins the history: broadcast-only joins") {
    val docs = Tables.documents(spark, sf)
    val isBatch = pmod(graft.operators.TextFunctions.hash60(
      col("doc_id").cast("string")), lit(10L)) < 1
    val p = graft.operators.Dedup.incrementalDedup(
        docs.filter(!isBatch), docs.filter(isBatch),
        "doc_id", "text", k = 16, shingleN = 3, bands = 8, threshold = 0.5)
      .queryExecution.executedPlan.toString
    // every history-touching join streams history against a broadcast
    // batch-derived side; a SortMergeJoin would mean the history got
    // shuffled on a join key — the exact cost this operator exists to
    // avoid (the only exchanges left are over candidate/batch rows)
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("contiguousShards on empty input returns an empty, well-typed frame") {
    import graft.operators.TextFunctions.tokenCount
    val empty = Tables.documents(spark, sf).filter(lit(false))
    val out = Packing.contiguousShards(empty, "doc_id", tokenCount(col("text")),
      budget = 500L, buckets = 8)
    assert(out.columns.toSeq == Seq("doc_id", "n_tokens", "global_offset", "shard"))
    assert(out.count() == 0)
  }
}
