package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Packing, Sampling}

/** Unit semantics for sequence packing and percentile trimming. */
class PackingSpec extends AnyFunSuite {
  lazy val spark = Sessions.local(4)
  import spark.implicits._

  private val sf001 = "/root/testdata/sf0.001"
  private def packed =
    Packing.packSequences(Tables.documents(spark, sf001), "doc_id", "text",
      shards = 4, budgetTokens = 256)

  test("packing is gapless: offsets are the running token sum mod budget") {
    val rows = packed.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val off = r.getAs[Long]("seq_offset")
      assert(off >= 0 && off < 256, s"offset $off outside [0, 256)")
    }
    // reconstruct each shard's stream: sorted by (seq_id, seq_offset),
    // global token position seq_id*budget + seq_offset must equal the
    // running sum of the previous docs' tokens (no gap, no overlap)
    rows.groupBy(_.getAs[Long]("shard")).foreach { case (_, rs) =>
      val ordered = rs.sortBy(r =>
        (r.getAs[Long]("seq_id"), r.getAs[Long]("seq_offset")))
      var cum = 0L
      ordered.foreach { r =>
        val pos = r.getAs[Long]("seq_id") * 256 + r.getAs[Long]("seq_offset")
        assert(pos == cum, s"doc at $pos but stream is at $cum")
        cum += r.getAs[Long]("n_tokens")
      }
    }
  }

  test("straddles iff the doc crosses a budget boundary") {
    packed.collect().foreach { r =>
      val expected = r.getAs[Long]("n_tokens") > 0 &&
        r.getAs[Long]("seq_offset") + r.getAs[Long]("n_tokens") > 256
      assert(r.getAs[Boolean]("straddles") == expected, r.toString)
    }
  }

  test("packing is invariant to the input partitioning") {
    val base = packed.collect().map(_.toString).sorted
    val re = Packing.packSequences(
      Tables.documents(spark, sf001).repartition(7), "doc_id", "text",
      shards = 4, budgetTokens = 256).collect().map(_.toString).sorted
    assert(base.toSeq == re.toSeq)
  }

  test("packing rejects id/text columns named like its own outputs") {
    // seq_id as idCol would silently emit two seq_id columns
    val df = Seq((1L, "a b c")).toDF("seq_id", "text")
    intercept[IllegalArgumentException] {
      Packing.packSequences(df, "seq_id", "text", shards = 2, budgetTokens = 8)
    }
    intercept[IllegalArgumentException] {
      Packing.packSequences(df.withColumnRenamed("seq_id", "straddles"),
        "straddles", "text", shards = 2, budgetTokens = 8)
    }
  }

  test("stratifiedSample keeps exactly ceil(frac * n_g) per group, deterministically") {
    val docs = Tables.documents(spark, sf001)
    val expected = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> math.ceil(r.getLong(1) * 0.1).toLong).toMap
    val got = Sampling.stratifiedSample(docs, Seq("lang"), col("doc_id").cast("string"), 0.1)
    val kept = got.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(kept == expected, s"$kept vs $expected")
    // same selection under a different input partitioning
    val again = Sampling.stratifiedSample(docs.repartition(7), Seq("lang"),
      col("doc_id").cast("string"), 0.1)
    assert(got.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq ==
      again.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq)
  }

  test("stratifiedSample keeps the NULL stratum (null-safe quota join)") {
    val df = Seq((1L, "en"), (2L, "en"), (3L, null), (4L, null), (5L, null))
      .toDF("id", "lang")
    val kept = Sampling.stratifiedSample(df, Seq("lang"), col("id").cast("string"), 0.5)
      .groupBy("lang").count().collect()
      .map(r => Option(r.getString(0)) -> r.getLong(1)).toMap
    // en: ceil(0.5*2) = 1; NULL stratum: ceil(0.5*3) = 2, not silently dropped
    assert(kept == Map(Some("en") -> 1L, None -> 2L), kept.toString)
  }

  test("applyMixture: floor(w*B) per group, capped by group size") {
    val df = ((1 to 95).map(i => (i.toLong, "big")) ++
      (96 to 100).map(i => (i.toLong, "tiny"))).toDF("id", "src")
    // p = .95/.05 -> w = sqrt(p)/denom ≈ .813/.187; B=80 asks tiny for
    // floor(.187*80) ≈ 14 rows — more than its 5: it keeps all 5,
    // while big keeps exactly its floor(w*B) quota
    val kept = Sampling.applyMixture(df, "src", col("id").cast("string"), budget = 80)
      .groupBy("src").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val wBig = math.sqrt(0.95) / (math.sqrt(0.95) + math.sqrt(0.05))
    assert(kept("big") == math.floor(wBig * 80).toLong)
    assert(kept("tiny") == 5)
  }

  test("trimByPercentile keeps exactly the inner percentile band") {
    // 1..100 in one group: p05 = 5.95, p95 = 95.05 -> kept = 6..95
    val df = (1 to 100).map(v => ("g", v.toLong)).toDF("grp", "v")
    val kept = Sampling.trimByPercentile(df, Seq("grp"), col("v"), 0.05, 0.95)
      .select("v").as[Long].collect().sorted
    assert(kept.toSeq == (6L to 95L).toSeq, kept.mkString(","))
  }

  test("trimByPercentile trims within each group independently") {
    val df = ((1 to 100).map(v => ("a", v.toLong)) ++
      (1001 to 1010).map(v => ("b", v.toLong))).toDF("grp", "v")
    val kept = Sampling.trimByPercentile(df, Seq("grp"), col("v"), 0.05, 0.95)
    val byGrp = kept.groupBy("grp").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byGrp("a") == 90)
    // 10 values: p05 = 1001.45, p95 = 1009.55 -> kept = 1002..1009
    assert(byGrp("b") == 8)
  }
}
