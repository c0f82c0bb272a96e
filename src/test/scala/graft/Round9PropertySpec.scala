package graft

import scala.util.Random

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Dedup, Packing, Similarity, TextFunctions}

/** Seeded randomized invariants for the round-9 operators: the
  * single-pass encoder must equal its per-dimension reference on
  * arbitrary text, the signature-store dedup must be verdict-identical
  * to recompute-from-text on arbitrary corpora, the derived-bucket
  * prefix sum must equal the naive window, and the semantic-dedup cap
  * must only ever shrink the drop set.
  */
class Round9PropertySpec extends AnyFunSuite {
  lazy val spark = Sessions.local(4)

  private val vocab = Vector("alpha", "beta", "gamma", "delta", "epsilon",
    "zeta", "eta", "theta", "Ω", "ü", "名", "x1", "2y", "z_3", "-", "...")

  private def randText(rnd: Random): String = rnd.nextInt(6) match {
    case 0 => "" // empty doc
    case 1 => "   " // whitespace only
    case _ => Seq.fill(1 + rnd.nextInt(30))(vocab(rnd.nextInt(vocab.size)))
      .mkString(sep = if (rnd.nextBoolean()) " " else "  ")
  }

  test("hashEmbed fold == per-dim reference on arbitrary text and dims") {
    import spark.implicits._
    for (seed <- 1 to 5) {
      val rnd = new Random(seed)
      val dim = 1 + rnd.nextInt(64)
      val texts = Seq.fill(120)(randText(rnd))
      val mismatch = texts.toDF("text")
        .select(TextFunctions.hashEmbed(col("text"), dim).as("fast"),
          TextFunctions.hashEmbedPerDim(col("text"), dim).as("ref"))
        .filter(!(col("fast") === col("ref"))).count()
      assert(mismatch == 0, s"seed=$seed dim=$dim")
    }
  }

  test("store-based incremental dedup ≡ recompute on arbitrary corpora") {
    import spark.implicits._
    for (seed <- 1 to 3) {
      val rnd = new Random(seed)
      val n = 40 + rnd.nextInt(80)
      // random docs with injected exact and near duplicates across the
      // history/batch boundary
      val base = (0 until n).map(i => (i.toLong, randText(rnd)))
      val docs = base ++ base.filter(_ => rnd.nextInt(3) == 0).map {
        case (id, t) =>
          val mutated = if (rnd.nextBoolean()) t
            else (t + " " + vocab(rnd.nextInt(vocab.size))).trim
          (id + 10000L, mutated)
      }
      val df = docs.toDF("id", "text").repartition(1 + rnd.nextInt(5))
      val isBatch = pmod(TextFunctions.hash60(col("id").cast("string")), lit(4L)) < 1
      val history = df.filter(!isBatch)
      val batch = df.filter(isBatch)
      val (k, bands) = Seq((16, 8), (16, 4), (8, 4))(rnd.nextInt(3))
      val thr = 0.3 + rnd.nextDouble() * 0.5

      val root = java.nio.file.Files.createTempDirectory(s"graft_p9_$seed").toString
      try {
        Dedup.writeSignatureStore(history, "id", "text", k, 3, root, 1L)
        val a = Dedup.incrementalDedupFromStore(
          Dedup.readSignatureStore(spark, root), batch, "id", "text", k, 3, bands, thr)
        val b = Dedup.incrementalDedup(history, batch, "id", "text", k, 3, bands, thr)
        assert(a.exceptAll(b).count() == 0 && b.exceptAll(a).count() == 0,
          s"seed=$seed k=$k bands=$bands thr=$thr")
      } finally {
        org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(root))
      }
    }
  }

  test("contiguousShards derived buckets == naive window on arbitrary shapes") {
    import spark.implicits._
    for (seed <- 1 to 5) {
      val rnd = new Random(seed)
      val n = 30 + rnd.nextInt(200)
      // ids spread over (possibly) the whole positive long range — the
      // shape the division-first bucket arithmetic exists for
      val span = if (rnd.nextBoolean()) 1L << 40 else Long.MaxValue - 2
      val ids = Iterator.continually(rnd.nextLong(span)).distinct.take(n).toSeq
      val rows = ids.map(id => (id, rnd.nextLong(1000L)))
      val budget = 1L + rnd.nextLong(3000L)
      val got = Packing.contiguousShards(
          rows.toDF("id", "w").repartition(1 + rnd.nextInt(5)),
          "id", col("w"), budget) // buckets = 0: derived
        .orderBy("id").collect()
      val naive = rows.sortBy(_._1)
        .scanLeft((0L, 0L, 0L)) { case ((_, _, cum), (id, w)) => (id, w, cum + w) }
        .drop(1)
      assert(got.length == naive.length, s"seed=$seed")
      got.zip(naive).foreach { case (g, (id, w, cumAfter)) =>
        val before = cumAfter - w
        assert(g.getLong(0) == id && g.getLong(1) == w &&
          g.getLong(2) == before && g.getLong(3) == before / budget,
          s"seed=$seed budget=$budget: $g != ($id,$w,$before,${before / budget})")
      }
    }
  }

  test("semanticDedup cap only shrinks the drop set, never grows or flips it") {
    import spark.implicits._
    for (seed <- 1 to 3) {
      val rnd = new Random(seed)
      val dim = 4
      val n = 60 + rnd.nextInt(60)
      val vecs = (0 until n).map { i =>
        (i.toLong, Array.fill(dim)((rnd.nextInt(9) - 4).toFloat / 4f))
      }
      val df = vecs.toDF("vid", "v")
      val cents = df.filter(col("vid") < (1 + rnd.nextInt(4)).toLong)
      val thr = 0.3 + rnd.nextDouble() * 0.6
      val uncapped = Similarity.semanticDedup(df, cents, "vid", "v", thr)
      val cap = 2 + rnd.nextInt(12)
      val capped = Similarity.semanticDedup(df, cents, "vid", "v", thr, cap)
      assert(capped.count() == n && uncapped.count() == n, s"seed=$seed")
      val extra = capped.filter(col("dropped")).select("vid")
        .join(uncapped.filter(col("dropped")).select("vid"),
          Seq("vid"), "left_anti").count()
      assert(extra == 0, s"seed=$seed cap=$cap thr=$thr: capped dropped a kept vector")
      // centroid assignment is cap-independent
      val moved = capped.select(col("vid"), col("centroid_id"))
        .exceptAll(uncapped.select(col("vid"), col("centroid_id"))).count()
      assert(moved == 0, s"seed=$seed: cap changed cluster assignment")
    }
  }

  test("kMinValues == naive per-group bottom-k on arbitrary data, any fanout") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    for (seed <- 1 to 3) {
      val rnd = new Random(seed)
      val k = 1 + rnd.nextInt(20)
      val fanout = 1 + rnd.nextInt(100)
      val groups = 1 + rnd.nextInt(6)
      // skewed values with heavy duplication and negative-free domain
      // (hash domains are non-negative, like the production callers)
      val rows = Seq.fill(300 + rnd.nextInt(700))(
        (s"g${rnd.nextInt(groups)}", rnd.nextInt(1 << rnd.nextInt(16)).toLong))
      val df = rows.toDF("g", "v")
      val naive = df.select($"g", $"v").distinct()
        .withColumn("rn",
          row_number().over(Window.partitionBy($"g").orderBy($"v")))
        .filter($"rn" <= k).drop("rn")
        .as[(String, Long)].collect().toSet
      val got = graft.operators.Sketches
        .kMinValues(df, "g", "v", k = k, fanout = fanout)
        .as[(String, Long)].collect().toSet
      assert(got == naive, s"seed=$seed k=$k fanout=$fanout")
    }
  }

  test("pqCodes and pqAdcTopK are partitioning-independent") {
    // codes come from a partial min(struct) aggregate and scores from
    // an exact fixed-point sum — neither may depend on how the input
    // is split across tasks
    val e = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val cb = Similarity.pqCodebook(e.filter(col("vec_id") < 8),
      "vec_id", "embedding", dim = 64, m = 4)
    def run(vectors: org.apache.spark.sql.DataFrame) = (
      Similarity.pqCodes(vectors, cb, "vec_id", "embedding", 64, 4)
        .collect().map(_.toSeq).toSet,
      Similarity.pqAdcTopK(vectors, e.filter(col("vec_id") < 3), cb,
          "vec_id", "embedding", 64, 4, k = 5)
        .collect().map(_.toSeq).toSet)
    val (c1, a1) = run(e)
    val (c7, a7) = run(e.repartition(7))
    assert(c1 == c7, "codes changed under repartition")
    assert(a1 == a7, "ADC top-k changed under repartition")
  }
}
