package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{DataQuality, Incremental, Resample, Sampling, Similarity}

/** Unit semantics for the round-4 analytics additions: trailing
  * range-frame windows, exact trend slopes, incremental partials,
  * quantile binning, sign-projection LSH, and the aggregate argmax.
  */
class AnalyticsOpsSpec extends AnyFunSuite {
  lazy val spark = Sessions.local(4)
  import spark.implicits._

  private def ts(day: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-$day%02d 12:00:00")

  // ------------------------------------------- trailing range frame

  test("trailingDaily: a calendar gap shrinks the frame's row count, never its span") {
    val df = Seq(
      ("a", ts(1), 1L), ("a", ts(2), 2L), ("a", ts(10), 4L))
      .toDF("k", "t", "v")
    val got = Resample.trailingDaily(df, col("t"), Seq("k"), col("v"), 7)
      .orderBy(col("day"))
      .select(col("trailing_total"), col("trailing_days"))
      .as[(Long, Long)].collect()
    // day 10 is > 7 days after days 1–2: its window holds ONLY day 10.
    // A ROWS-frame implementation would report 7 (1+2+4) instead of 4.
    assert(got.toSeq == Seq((1L, 1L), (3L, 2L), (4L, 1L)))
  }

  test("trailingDaily: same-day rows aggregate before the frame applies") {
    val df = Seq(("a", ts(3), 5L), ("a", ts(3), 7L), ("a", ts(4), 1L))
      .toDF("k", "t", "v")
    val got = Resample.trailingDaily(df, col("t"), Seq("k"), col("v"), 2)
      .orderBy(col("day"))
      .select(col("n_events"), col("day_total"), col("trailing_total"))
      .as[(Long, Long, Long)].collect()
    assert(got.toSeq == Seq((2L, 12L, 12L), (1L, 1L, 13L)))
  }

  // ------------------------------------------------- trend slopes

  test("trendSlopes: exact least squares on a hand-computed line") {
    // (0,0) (1,2) (2,4): slope 2, mean 2 — both exactly representable
    val df = Seq(("g", 0L, 0L), ("g", 1L, 2L), ("g", 2L, 4L))
      .toDF("k", "x", "y")
    val r = DataQuality.trendSlopes(df, Seq("k"), col("x"), col("y"))
      .collect().head
    assert(r.getAs[Long]("n_rows") == 3L)
    assert(r.getAs[Double]("slope") == 2.0)
    assert(r.getAs[Double]("mean_y") == 2.0)
  }

  test("trendSlopes: a single-x group has no slope (NULL, not NaN/crash)") {
    val df = Seq(("g", 5L, 1L), ("g", 5L, 9L)).toDF("k", "x", "y")
    val r = DataQuality.trendSlopes(df, Seq("k"), col("x"), col("y"))
      .collect().head
    assert(r.isNullAt(r.fieldIndex("slope")))
    assert(r.getAs[Double]("mean_y") == 5.0)
  }

  // ------------------------------------------- incremental partials

  test("Incremental: partials from disjoint day ranges merge to the full recompute") {
    val df = Seq(
      ("O", ts(1), 100L), ("O", ts(15), 10L), ("O", ts(20), 1L),
      ("F", ts(2), 7L), ("F", ts(28), 3L))
      .toDF("status", "t", "v")
      .withColumn("day", to_date(col("t")))
    val split = java.sql.Date.valueOf("2024-01-16")
    val p1 = Incremental.dailyPartials(
      df.filter(col("day") < split), Seq("status"), col("day"), col("v"))
    val p2 = Incremental.dailyPartials(
      df.filter(col("day") >= split), Seq("status"), col("day"), col("v"))
    val merged = Incremental.mergeToPeriod(
      p1.unionByName(p2), Seq("status"), d => trunc(d, "month"))
    val direct = df.groupBy(col("status"), trunc(col("day"), "month").as("period"))
      .agg(count(lit(1)).as("n_rows"),
        sum(col("v").cast("decimal(38,0)")).as("sum_value"))
    assert(merged.orderBy("status").collect().toSeq ==
      direct.orderBy("status").collect().toSeq)
  }

  test("Incremental.writePartials: dynamic overwrite rewrites one day, not the table") {
    val dir = java.nio.file.Files.createTempDirectory("graft_inc").toString
    val df = Seq(
      ("O", ts(1), 100L), ("O", ts(2), 10L), ("F", ts(2), 3L))
      .toDF("status", "t", "v")
    val partials = Incremental.dailyPartials(
      df, Seq("status"), to_date(col("t")), col("v"))
    Incremental.writePartials(partials, dir)
    val before = spark.read.parquet(dir).collect().toSet

    // a corrected re-load of day 2 only
    val day2 = Seq(("O", ts(2), 11L), ("F", ts(2), 4L)).toDF("status", "t", "v")
    Incremental.writePartials(Incremental.dailyPartials(
      day2, Seq("status"), to_date(col("t")), col("v")), dir)

    val after = spark.read.parquet(dir)
      .select("status", "day", "n_rows", "sum_value").collect().toSet
    // day 1 survived the overwrite; day 2 carries the corrected sums
    assert(after.exists(r => r.getAs[Long]("n_rows") == 1L
      && r.getAs[java.math.BigDecimal]("sum_value").longValue == 100L))
    assert(after.size == 3 && after != before)
    assert(spark.read.parquet(dir)
      .filter(col("day") === java.sql.Date.valueOf("2024-01-02"))
      .agg(sum(col("sum_value"))).as[java.math.BigDecimal]
      .collect().head.longValue == 15L)
  }

  // ----------------------------------------------- quantile binning

  test("quantileBins: quartiles of 1..100 split into four bins of 25") {
    val df = (1 to 100).map(_.toDouble).toDF("v")
    val got = Sampling.quantileBins(df, col("v"), Seq(0.25, 0.5, 0.75))
      .groupBy("bin").count().orderBy("bin")
      .as[(Long, Long)].collect()
    assert(got.toSeq == Seq((0L, 25L), (1L, 25L), (2L, 25L), (3L, 25L)))
  }

  test("quantileBins: a value equal to a boundary lands in the upper bin") {
    // p50 of 1..3 is exactly 2; bin(2) must be 1 (v >= bound)
    val df = Seq(1.0, 2.0, 3.0).toDF("v")
    val got = Sampling.quantileBins(df, col("v"), Seq(0.5))
      .orderBy("v").select("bin").as[Long].collect()
    assert(got.toSeq == Seq(0L, 1L, 1L))
  }

  test("quantileBins: NULL values get a NULL bin, never bin 0") {
    val df = Seq(Some(1.0), None, Some(3.0), Some(2.0)).toDF("v")
    val got = Sampling.quantileBins(df, col("v"), Seq(0.5)).collect()
    val nullRow = got.find(_.isNullAt(0)).get
    assert(nullRow.isNullAt(nullRow.fieldIndex("bin")))
    assert(got.count(r => !r.isNullAt(0) && r.getAs[Long]("bin") == 0L) == 1)
  }

  test("quantileBins rejects unsorted fractions and reserved columns") {
    val df = Seq(1.0).toDF("v")
    intercept[IllegalArgumentException] {
      Sampling.quantileBins(df, col("v"), Seq(0.75, 0.25))
    }
    intercept[IllegalArgumentException] {
      Sampling.quantileBins(df.withColumn("bin", lit(1)), col("v"), Seq(0.5))
    }
  }

  // -------------------------------------- sign-projection (RP) LSH

  test("rpLshNearDupPairs: a sound, deterministic subset of the all-pairs answer") {
    val e = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val lsh = Similarity.rpLshNearDupPairs(e, "vec_id", "embedding",
      dim = 64, bits = 6, tables = 6, threshold = 0.30)
    val got = lsh.orderBy("id_a", "id_b")
      .as[(Long, Long, Double)].collect().toSeq
    assert(got.nonEmpty, "LSH found no pairs — bits/tables too selective")
    assert(got.forall { case (a, b, c) => a < b && c > 0.30 })
    // soundness: every LSH pair is in the brute-force all-pairs set
    val a = e.select(col("vec_id").as("id_a"), col("embedding").as("va"))
    val b = e.select(col("vec_id").as("id_b"), col("embedding").as("vb"))
    val all = a.join(b, col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        Similarity.cosine(col("va"), col("vb")).as("c"))
      .filter(col("c") > 0.30)
      .as[(Long, Long, Double)].collect()
      .map { case (x, y, c) => (x, y) -> c }.toMap
    got.foreach { case (x, y, c) =>
      assert(all.get((x, y)).contains(c), s"($x,$y) not an all-pairs near-dup")
    }
    // determinism: the planes are hash-derived, not RNG-seeded
    val again = Similarity.rpLshNearDupPairs(e, "vec_id", "embedding",
      dim = 64, bits = 6, tables = 6, threshold = 0.30)
      .orderBy("id_a", "id_b").as[(Long, Long, Double)].collect().toSeq
    assert(again == got)
  }

  test("rpSignatures: one row per (vector, table), buckets within bit range") {
    val e = Tables.embeddings(spark, "/root/testdata/sf0.001").limit(10)
    val sig = Similarity.rpSignatures(e, "embedding", dim = 64, bits = 6,
      tables = 4)
    assert(sig.count() == 40)
    val buckets = sig.select("rp_bucket").as[Long].collect()
    assert(buckets.forall(v => v >= 0 && v < 64))
    assert(sig.select("rp_table").distinct().count() == 4)
  }

  // --------------------------------------------- video frame slices

  test("frameSample: slices are the exact payload bytes at the stub frame grid") {
    import graft.operators.Multimodal
    // 62 bytes → frames = 62 % 30 + 1 = 3, frame_len = 20
    val payload = ("abcdefghij" * 6 ++ "XY").getBytes("UTF-8")
    assert(payload.length == 62)
    val media = Seq((1L, "video", payload), (2L, "image", payload))
      .toDF("media_id", "kind", "payload")
    val got = Multimodal.frameSample(media, k = 4)
      .orderBy("frame_idx").collect()
    // only the video row samples; k=4 over 3 frames dedups to ⌊j·3/4⌋ ∈ {0,1,2}
    assert(got.map(_.getAs[Long]("media_id")).toSet == Set(1L))
    assert(got.map(_.getAs[Long]("frame_idx")).toSeq == Seq(0L, 1L, 2L))
    got.foreach { r =>
      val off = r.getAs[Long]("frame_offset").toInt
      val len = r.getAs[Long]("frame_len").toInt
      assert(len == 20 && off == r.getAs[Long]("frame_idx").toInt * 20)
      val expected = java.security.MessageDigest.getInstance("MD5")
        .digest(payload.slice(off, off + len))
        .map(b => f"$b%02x").mkString
      assert(r.getAs[String]("frame_md5") == expected)
    }
  }

  test("frameSample: a long video yields k distinct strided frames") {
    import graft.operators.Multimodal
    // 89 bytes → frames = 89 % 30 + 1 = 30, frame_len = 2 (floor)
    val payload = Array.tabulate[Byte](89)(i => (i % 97).toByte)
    val media = Seq((7L, "video", payload)).toDF("media_id", "kind", "payload")
    val got = Multimodal.frameSample(media, k = 4)
      .select("frame_idx").as[Long].collect().toSeq
    assert(got == Seq(0L, 7L, 15L, 22L)) // ⌊j·30/4⌋
  }

  // ------------------------------------- typed-Aggregator signatures

  test("SignatureMin: group signature == elementwise min, stable under repartitioning") {
    import graft.operators.Dedup
    val df = Seq(
      ("g1", Seq(5L, 9L, 2L)), ("g1", Seq(3L, 11L, 7L)), ("g1", Seq(4L, 8L, 8L)),
      ("g2", Seq(1L, 1L, 1L)))
      .toDF("g", "sig")
    val agg = udaf(new Dedup.SignatureMin(3))
    def run(d: org.apache.spark.sql.DataFrame) =
      d.groupBy("g").agg(agg(col("sig")).as("gsig"))
        .orderBy("g").as[(String, Seq[Long])].collect().toSeq
    val expected = Seq("g1" -> Seq(3L, 8L, 2L), "g2" -> Seq(1L, 1L, 1L))
    assert(run(df) == expected)
    // merge path: many partitions → partial buffers must combine to
    // the same result as the single-partition reduce path
    assert(run(df.repartition(8)) == expected)
    assert(run(df.coalesce(1)) == expected)
  }

  test("SignatureMin rejects signatures of the wrong width") {
    import graft.operators.Dedup
    val df = Seq(("g", Seq(1L, 2L))).toDF("g", "sig")
    val agg = udaf(new Dedup.SignatureMin(3))
    val e = intercept[Exception] {
      df.groupBy("g").agg(agg(col("sig"))).collect()
    }
    assert(e.getMessage != null)
  }

  // ------------------------------------------- sketch re-aggregation

  test("HLL sketches merge losslessly: union of disjoint partials == one-pass sketch") {
    val df = (1L to 5000L).map(i => (i % 3, i % 1700)).toDF("g", "u")
    val onePass = df.groupBy("g")
      .agg(hll_sketch_estimate(hll_sketch_agg(col("u"))).as("est"))
      .orderBy("g").as[(Long, Long)].collect().toSeq
    val partials = df.filter(col("u") % 2 === 0).groupBy("g")
      .agg(hll_sketch_agg(col("u")).as("sk"))
      .unionByName(df.filter(col("u") % 2 === 1).groupBy("g")
        .agg(hll_sketch_agg(col("u")).as("sk")))
    val merged = partials.groupBy("g")
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("est"))
      .orderBy("g").as[(Long, Long)].collect().toSeq
    // the merge is exact at the SKETCH level (same registers), so the
    // estimates are identical — not merely within the error bound
    assert(merged == onePass)
  }

  // ------------------------------------------------ aggregate argmax

  test("max(struct) argmax breaks total ties on the higher user id") {
    val df = Seq(("t", 1L, 10L), ("t", 2L, 10L), ("t", 3L, 5L))
      .toDF("event_type", "user_id", "total")
    val r = df.groupBy("event_type")
      .agg(max(struct(col("total"), col("user_id"))).as("m"))
      .select(col("m.user_id"), col("m.total"))
      .as[(Long, Long)].collect().head
    assert(r == ((2L, 10L)))
  }
}
