package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Chunking, Pii, Similarity, TextAnalysis}

/** Unit semantics for the round-4 operators: PII scrubbing, context-
  * window chunking, keyword extraction, and the k-means Lloyd step.
  */
class Round4OpsSpec extends AnyFunSuite {
  lazy val spark = Sessions.local(4)
  import spark.implicits._

  // ----------------------------------------------------------- PII

  test("Pii.scrub redacts and counts all four kinds") {
    val df = Seq(
      (1L, "mail a.b+c@site.io and 192.168.0.1 ssn 123-45-6789 tel 415 555 0100"),
      (2L, "nothing sensitive here")).toDF("doc_id", "text")
    val got = Pii.scrub(df, "text").collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    val r1 = got(1L)
    assert(r1.getAs[String]("redacted") ==
      "mail <EMAIL> and <IP> ssn <SSN> tel <PHONE>")
    assert(r1.getAs[Long]("n_email") == 1 && r1.getAs[Long]("n_ipv4") == 1 &&
      r1.getAs[Long]("n_ssn") == 1 && r1.getAs[Long]("n_phone") == 1)
    val r2 = got(2L)
    assert(r2.getAs[String]("redacted") == "nothing sensitive here")
    assert(r2.getAs[Long]("n_email") == 0 && r2.getAs[Long]("n_phone") == 0)
  }

  test("Pii rules apply in order: an email with an IP-shaped host is ONE email") {
    val df = Seq((1L, "ping admin@10.0.0.1.example.com now")).toDF("doc_id", "text")
    val r = Pii.scrub(df, "text").collect().head
    assert(r.getAs[String]("redacted") == "ping <EMAIL> now")
    assert(r.getAs[Long]("n_email") == 1)
    assert(r.getAs[Long]("n_ipv4") == 0) // consumed by the email rule
  }

  test("Pii.scrub fails fast on output-name collisions") {
    val df = Seq((1L, "x", "y")).toDF("doc_id", "text", "redacted")
    intercept[IllegalArgumentException] { Pii.scrub(df, "text") }
    val df2 = Seq((1L, "x", 0L)).toDF("doc_id", "text", "n_email")
    intercept[IllegalArgumentException] { Pii.scrub(df2, "text") }
  }

  // ------------------------------------------------------ chunking

  test("chunkByTokens emits strided windows with exact offsets") {
    val df = Seq((7L, "t1 t2 t3 t4 t5 t6 t7 t8 t9 t10")).toDF("doc_id", "text")
    val got = Chunking.chunkByTokens(df, "doc_id", "text",
        chunkTokens = 4, strideTokens = 3)
      .orderBy("chunk_id").collect()
    val rows = got.map(r => (r.getAs[Long]("chunk_id"),
      r.getAs[Long]("chunk_start"), r.getAs[Long]("n_chunk_tokens"),
      r.getAs[String]("chunk_text")))
    assert(rows.toSeq == Seq(
      (0L, 0L, 4L, "t1 t2 t3 t4"),
      (1L, 3L, 4L, "t4 t5 t6 t7"),
      (2L, 6L, 4L, "t7 t8 t9 t10"),
      (3L, 9L, 1L, "t10")))
  }

  test("chunkByTokens: empty docs emit nothing; guards fire") {
    val df = Seq((1L, ""), (2L, "   "), (3L, "only")).toDF("doc_id", "text")
    val got = Chunking.chunkByTokens(df, "doc_id", "text", 8, 8).collect()
    assert(got.length == 1 && got.head.getAs[String]("chunk_text") == "only")
    intercept[IllegalArgumentException] {
      Chunking.chunkByTokens(df, "doc_id", "text", chunkTokens = 4, strideTokens = 5)
    }
    intercept[IllegalArgumentException] {
      Chunking.chunkByTokens(df.withColumnRenamed("doc_id", "chunk_id"),
        "chunk_id", "text", 4, 4)
    }
  }

  test("non-overlapping chunks reassemble to the original token stream") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val rebuilt = Chunking.chunkByTokens(docs, "doc_id", "text", 32, 32)
      .groupBy("doc_id")
      .agg(concat_ws(" ", array_sort(collect_list(struct(col("chunk_id"),
        col("chunk_text")))).getField("chunk_text")).as("rebuilt"),
        sum("n_chunk_tokens").as("n"))
    val orig = docs.select(col("doc_id"),
      concat_ws(" ", graft.operators.TextFunctions.tokens(col("text"))).as("orig"),
      graft.operators.TextFunctions.tokenCount(col("text")).cast("long").as("n_orig"))
    val joined = rebuilt.join(orig, "doc_id")
    assert(joined.filter(col("rebuilt") =!= col("orig") || col("n") =!= col("n_orig"))
      .count() == 0)
  }

  // ------------------------------------------------------ keywords

  test("topKeywords ranks by exact tf*N/df with token tie-break") {
    val df = Seq((1L, "x x y"), (2L, "y z")).toDF("doc_id", "text")
    val got = TextAnalysis.topKeywords(df, "doc_id", "text", k = 2)
      .collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("rank")) ->
        (r.getAs[String]("token"), r.getAs[Double]("score"))).toMap
    // doc 1: x tf=2 df=1 -> 4.0 ; y tf=1 df=2 -> 1.0
    assert(got((1L, 1L)) == ("x", 4.0))
    assert(got((1L, 2L)) == ("y", 1.0))
    // doc 2: z tf=1 df=1 -> 2.0 ; y -> 1.0
    assert(got((2L, 1L)) == ("z", 2.0))
    assert(got((2L, 2L)) == ("y", 1.0))
  }

  test("topKeywords: equal scores break ties by token ascending") {
    val df = Seq((1L, "b a")).toDF("doc_id", "text")
    val got = TextAnalysis.topKeywords(df, "doc_id", "text", k = 2)
      .orderBy("rank").collect().map(_.getAs[String]("token"))
    assert(got.toSeq == Seq("a", "b"))
  }

  // ------------------------------------------- streaming SCD2 upsert

  test("ScdUpsert: streamed micro-batch merges equal the batch SCD2 chain") {
    import java.time.LocalDate
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.ScdUpsert

    val dimRoot = java.nio.file.Files.createTempDirectory("graft_scd_up").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_scd_ck").toString
    // id-SET delta, not a count: the ContextCleaner may async-drop a
    // dead pin from an earlier suite between the captures (the
    // LanguageModelSpec round-15 flake class)
    val pinnedBefore = spark.sparkContext.getPersistentRDDs.keySet.toSet

    val b1 = Seq(("p1", "addr one", "Ng"), ("p2", "addr two", "Li"))
    val b2 = Seq(("p1", "addr MOVED", "Ng"), ("p3", "addr three", "Ok"))
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(String, String, String)]
    val snaps = mem.toDF.toDF("pid", "address", "last_name")
    val q = ScdUpsert.start(spark, snaps, dimRoot, ckpt, "pid",
      Seq("address", "last_name"), Seq("address", "last_name"), "sk",
      bid => LocalDate.of(2026, 1, 1 + bid.toInt))
    try {
      mem.addData(b1: _*); q.processAllAvailable()
      mem.addData(b2: _*); q.processAllAvailable()
    } finally q.stop()

    val streamed = ScdUpsert.currentDim(spark, dimRoot).get
      .collect().map(_.toString).sorted.toSeq
    // the per-batch TARGETED release kept stream storage flat on its
    // own — no session-wide sweep ran (assert BEFORE the batch twin
    // below checkpoints its own frames)
    val leakedPins =
      spark.sparkContext.getPersistentRDDs.keySet.toSet -- pinnedBefore
    assert(leakedPins.isEmpty, s"stream leaked blocks: $leakedPins")
    // batch twin: the same two snapshots applied sequentially
    val d1 = operators.ScdType2(b1.toDF("pid", "address", "last_name"), None,
      "pid", Seq("address", "last_name"), Seq("address", "last_name"), "sk",
      LocalDate.of(2026, 1, 1))
    val d2 = operators.ScdType2(b2.toDF("pid", "address", "last_name"), Some(d1),
      "pid", Seq("address", "last_name"), Seq("address", "last_name"), "sk",
      LocalDate.of(2026, 1, 2))
    assert(streamed == d2.collect().map(_.toString).sorted.toSeq)
    // p1 has two versions (address changed), p2/p3 one each
    assert(streamed.length == 4)
    // release the batch twin's own checkpoints (d2's plan reaches both)
    operators.Checkpoints.releasePinned(d2)
    val twinLeaked =
      spark.sparkContext.getPersistentRDDs.keySet.toSet -- pinnedBefore
    assert(twinLeaked.isEmpty, s"twin release incomplete: $twinLeaked")
  }

  // ------------------------------------------------------- k-means

  private def vecs(rows: (Long, Seq[Float])*) =
    rows.toSeq.toDF("vec_id", "embedding")

  test("kmeansStep: means are exact per (cluster, dim) and members count") {
    // two tight clusters around (1,0) and (0,1); seeds = members 0, 2
    val corpus = vecs(
      0L -> Seq(1f, 0f), 1L -> Seq(0.5f, 0.25f),
      2L -> Seq(0f, 1f), 3L -> Seq(0.25f, 0.5f))
    val seeds = vecs(0L -> Seq(1f, 0f), 2L -> Seq(0f, 1f))
    val got = Similarity.kmeansStep(corpus, seeds, "vec_id", "embedding")
      .collect()
      .map(r => (r.getAs[Long]("centroid_id"), r.getAs[Long]("dim")) ->
        (r.getAs[Long]("n_members"), r.getAs[Double]("mean"))).toMap
    // cluster 0 <- {0, 1}: mean (0.75, 0.125); cluster 2 <- {2, 3}:
    // mean (0.125, 0.75). These values are dyadic: fixed-point is EXACT.
    assert(got((0L, 0L)) == ((2L, 0.75)) && got((0L, 1L)) == ((2L, 0.125)))
    assert(got((2L, 0L)) == ((2L, 0.125)) && got((2L, 1L)) == ((2L, 0.75)))
  }

  test("kmeansStep quantization error is bounded by 2^-fracBits") {
    val corpus = vecs(0L -> Seq(0.1f, 0.7f), 1L -> Seq(0.3f, 0.2f))
    val seeds = vecs(0L -> Seq(0.2f, 0.45f))
    val got = Similarity.kmeansStep(corpus, seeds, "vec_id", "embedding")
      .collect().map(r => r.getAs[Long]("dim") -> r.getAs[Double]("mean")).toMap
    val exact0 = (0.1f.toDouble + 0.3f.toDouble) / 2
    val exact1 = (0.7f.toDouble + 0.2f.toDouble) / 2
    assert(math.abs(got(0L) - exact0) < 1e-12, s"${got(0L)} vs $exact0")
    assert(math.abs(got(1L) - exact1) < 1e-12, s"${got(1L)} vs $exact1")
  }

  test("kmeans converges on separable clusters and keeps empty seeds") {
    // 20 points near (10, 0), 20 near (0, 10) — in COSINE terms two
    // orthogonal directions — plus one seed pointing between them and
    // one seed at (-1,-1) that captures nothing after round 1
    val pts = (0 until 20).map(i => (100L + i, Seq(10f + i % 3, (i % 5) * 0.1f))) ++
      (0 until 20).map(i => (200L + i, Seq((i % 5) * 0.1f, 10f + i % 3)))
    val corpus = pts.toDF("vec_id", "embedding")
    val seeds = vecs(0L -> Seq(3f, 1f), 1L -> Seq(1f, 3f), 2L -> Seq(-1f, -1f))
    Bench.releaseBlocks(spark)
    val trained = Similarity.kmeans(corpus, seeds, "vec_id", "embedding", iters = 5)
    // superseded rounds were released in-loop: only the final round's
    // checkpoint stays pinned (the caller's to release)
    assert(spark.sparkContext.getPersistentRDDs.size == 1,
      s"kmeans pinned ${spark.sparkContext.getPersistentRDDs.size} frames")
    val cents = trained.collect()
      .map(r => r.getAs[Long]("centroid_id") -> r.getSeq[Double](1)).toMap
    assert(cents.size == 3)
    // centroid 0 ends x-heavy, centroid 1 y-heavy
    assert(cents(0L)(0) > 9 && cents(0L)(1) < 1, cents(0L).toString)
    assert(cents(1L)(1) > 9 && cents(1L)(0) < 1, cents(1L).toString)
    // the dead seed never gained members: unchanged coordinates
    assert(cents(2L) == Seq(-1f.toDouble, -1f.toDouble), cents(2L).toString)
    // final assignment splits the corpus 20/20 between live centroids
    val assigned = Similarity.ivfAssign(corpus,
        trained.select(col("centroid_id").as("vec_id"), col("embedding")),
        "vec_id", "embedding")
      .groupBy("centroid_id").count().collect()
      .map(r => r.getAs[Long]("centroid_id") -> r.getAs[Long]("count")).toMap
    assert(assigned == Map(0L -> 20L, 1L -> 20L), assigned.toString)
    Bench.releaseBlocks(spark) // kmeans checkpoints its per-round state
  }
}
