package graft

import scala.util.Random

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Boilerplate, InvertedIndex, LanguageModel, QualityClassifier}

/** Seeded randomized invariants for the round-14 operators, each
  * checked against a NAIVE DRIVER-SIDE REFERENCE implementation on
  * arbitrary corpora: boilerplate stripping (string-level df
  * semantics — a 60-bit hash collision would surface here), the
  * quality classifier's exact-integer argmax, the perplexity
  * filter's per-group keep set, and the full two-pass PRF ranking
  * (feedback selection, expansion votes, fixed-point OR scores).
  */
class Round14PropertySpec extends AnyFunSuite {
  lazy val spark = Sessions.local(4)

  private def md5_60(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    java.lang.Long.parseLong(d.take(8).map(b => f"$b%02x").mkString.take(15), 16)
  }

  private def toks(s: String): Seq[String] =
    s.trim.split("\\s+").toSeq.filter(_.nonEmpty)

  test("stripRepeatedLines equals the naive string-level reference on random corpora") {
    import spark.implicits._
    val linePool = Vector("nav home about", "cookie banner", "alpha beta",
      "gamma delta", "epsilon", "footer (c) site", "ζ ü 名", "unique")
    for (seed <- 1 to 3) {
      val rnd = new Random(seed)
      val docs = (0 until 60).map { i =>
        val domain = s"d${rnd.nextInt(3)}"
        val lines = Seq.fill(1 + rnd.nextInt(5))(
          linePool(rnd.nextInt(linePool.size)) +
            (if (rnd.nextBoolean()) "" else s" $i"))
        (i.toLong, domain, lines.mkString("\n"))
      }
      val minDf = 3L
      // naive reference: df by STRING equality per (domain, line)
      val df = docs.flatMap { case (id, dom, text) =>
        text.split("\n", -1).distinct.map(l => (dom, l) -> id)
      }.groupBy(_._1).view.mapValues(_.map(_._2).distinct.size).toMap
      val expect = docs.flatMap { case (id, dom, text) =>
        val lines = text.split("\n", -1).toSeq
        val kept = lines.filter(l => df((dom, l)) < minDf)
        if (kept.isEmpty) None
        else Some((id, dom, lines.size.toLong, kept.size.toLong,
          kept.mkString("\n")))
      }.sortBy(_._1)
      val got = Boilerplate.stripRepeatedLines(
          docs.toDF("doc_id", "domain", "text"),
          "doc_id", "domain", "text", minDf)
        .orderBy(col("doc_id"))
        .as[(Long, String, Long, Long, String)].collect().toSeq
      assert(got == expect, s"seed=$seed:\n got    $got\n expect $expect")
    }
  }

  private def nbReference(train: Seq[(String, String)],
      cand: Seq[(Long, String)], buckets: Int): Map[Long, String] = {
    def feats(text: String): Seq[Long] = {
      val t = toks(text)
      (t ++ t.sliding(2).filter(_.size == 2).map(_.mkString(" ")).toSeq)
        .map(g => md5_60(g) % buckets)
    }
    val cb = train.flatMap { case (l, t) => feats(t).map(b => (l, b)) }
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val labels = cb.keys.map(_._1).toSeq.distinct.sorted
    val cl = labels.map(l =>
      l -> cb.collect { case ((`l`, _), c) => c }.sum).toMap
    val v = cb.keys.map(_._2).toSeq.distinct.size.toLong
    def floor0(l: String): Long =
      math.floor(1L.toDouble * 1073741824.0 / (cl(l) + v)).toLong
    cand.flatMap { case (id, text) =>
      val fs = feats(text)
      if (fs.isEmpty) None
      else {
        val scored = labels.map { l =>
          val score = fs.map { b =>
            cb.get((l, b)) match {
              case Some(c) =>
                math.floor((c + 1L).toDouble * 1073741824.0 / (cl(l) + v)).toLong
              case None => floor0(l)
            }
          }.sum
          (l, score)
        }
        // argmax, ties on label ASC (the operator's rule)
        Some(id -> scored.sortBy { case (l, s) => (-s, l) }.head._1)
      }
    }.toMap
  }

  test("quality classifier equals the naive exact-integer NB reference on random corpora") {
    import spark.implicits._
    val vocab = Vector("click", "buy", "free", "the", "fox", "dog",
      "chapter", "x9")
    for (seed <- 1 to 3) {
      val rnd = new Random(seed)
      def text(): String =
        Seq.fill(2 + rnd.nextInt(12))(vocab(rnd.nextInt(vocab.size)))
          .mkString(" ")
      val train = (0 until 30).map(_ =>
        (if (rnd.nextBoolean()) "good" else "bad", text()))
      val cand = (0 until 20).map(i => (i.toLong, text()))
      val expect = nbReference(train, cand, buckets = 64)
      val counts = QualityClassifier.featureCounts(
        train.toDF("label", "text"), "label", "text", 64)
      val got = QualityClassifier.classify(cand.toDF("doc_id", "text"),
          counts, "doc_id", "text", 64)
      val gotMap = got.select(col("doc_id"), col("label_pred"))
        .as[(Long, String)].collect().toMap
      graft.operators.Checkpoints.releasePinned(got)
      assert(gotMap == expect, s"seed=$seed: $gotMap vs $expect")
    }
  }

  test("lmQualityFilter keep set equals the naive per-group quantile reference") {
    import spark.implicits._
    val vocab = Vector("a", "b", "c", "d", "e", "f")
    for (seed <- 1 to 3) {
      val rnd = new Random(seed)
      def text(): String =
        Seq.fill(2 + rnd.nextInt(10))(vocab(rnd.nextInt(vocab.size)))
          .mkString(" ")
      val train = (0 until 25).map(i => (i.toLong, text()))
      val cand = (100 until 140).map(i =>
        (i.toLong, s"g${rnd.nextInt(3)}", text()))
      // reference: Laplace bigram scores, cutoff = ceil(q·n)-th
      // ascending lm_avg per group, keep >= cutoff
      val bg = train.flatMap(d => toks(d._2).sliding(2).filter(_.size == 2)
        .map(p => (p(0), p(1))))
      val cb = bg.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val cl = bg.groupBy(_._1).view.mapValues(_.size.toLong).toMap
      val v = bg.map(_._2).distinct.size.toLong
      val scored = cand.flatMap { case (id, g, t) =>
        val bgs = toks(t).sliding(2).filter(_.size == 2)
          .map(p => (p(0), p(1))).toSeq
        if (bgs.isEmpty) None
        else {
          val fp = bgs.map { b =>
            math.floor((cb.getOrElse(b, 0L) + 1L).toDouble * 1073741824.0
              / (cl.getOrElse(b._1, 0L) + v)).toLong
          }.sum
          Some((id, g, fp.toDouble / bgs.size))
        }
      }
      val q = 0.5
      val expect = scored.groupBy(_._2).flatMap { case (_, rows) =>
        val asc = rows.map(_._3).sorted
        val cutoff = asc(math.ceil(q * asc.size).toInt - 1)
        rows.filter(_._3 >= cutoff)
      }.map(_._1).toSeq.sorted
      val kept = LanguageModel.lmQualityFilter(
        cand.toDF("doc_id", "src", "text"),
        LanguageModel.bigramCounts(train.toDF("doc_id", "text"),
          "doc_id", "text"),
        "doc_id", "text", "src", cutQ = q)
      val got = kept.select(col("doc_id")).as[Long].collect().toSeq.sorted
      graft.operators.Checkpoints.releasePinned(kept)
      assert(got == expect, s"seed=$seed:\n got    $got\n expect $expect")
    }
  }

  test("prfSearchFromStore equals the naive two-pass reference on random corpora") {
    import spark.implicits._
    val terms = Seq("alpha", "beta", "gamma")
    val vocab = Vector("alpha", "beta", "gamma", "delta", "epsilon",
      "zeta", "eta")
    for (seed <- 1 to 3) {
      val rnd = new Random(seed)
      val docs = (0 until 40).map(i => (i.toLong,
        Seq.fill(8 + rnd.nextInt(20))(vocab(rnd.nextInt(vocab.size)))
          .mkString(" ")))
      val (fbDocs, fbTerms, k) = (4, 2, 12)
      // --- reference
      val toksOf = docs.map { case (id, t) => id -> toks(t) }.toMap
      val nDocs = docs.size.toLong
      val totalLen = toksOf.values.map(_.size.toLong).sum
      def contrib(tf: Long, df: Long, dl: Long): Double =
        (((nDocs - df) + 0.5) / (df + 0.5)) *
          ((tf.toDouble * 2.25) / (tf + 1.25 * (0.25 + 0.75 *
            (dl.toDouble / (totalLen.toDouble / nDocs)))))
      def tfOf(ts: Seq[String]): Map[(Long, String), Long] =
        docs.flatMap { case (id, _) => toksOf(id).filter(ts.contains)
          .map(t => (id, t)) }.groupBy(identity)
          .view.mapValues(_.size.toLong).toMap
      val tf1 = tfOf(terms)
      val df1 = tf1.keys.toSeq.groupBy(_._2).view.mapValues(_.size.toLong).toMap
      val fb = docs.flatMap { case (id, _) =>
        val cs = terms.map(t => tf1.get((id, t))
          .map(contrib(_, df1(t), toksOf(id).size.toLong)))
        if (cs.exists(_.isEmpty)) None
        else Some(id -> cs.flatten.reduceLeft(_ + _))
      }.sortBy { case (id, s) => (-s, id) }.take(fbDocs).map(_._1)
      val expTerms = fb.flatMap(id => toksOf(id)).filterNot(terms.contains)
        .groupBy(identity).view.mapValues(_.size.toLong).toSeq
        .sortBy { case (t, c) => (-c, t) }.take(fbTerms).map(_._1)
      val allT = terms ++ expTerms
      val tf2 = tfOf(allT)
      val df2 = tf2.keys.toSeq.groupBy(_._2).view.mapValues(_.size.toLong).toMap
      val expect = docs.flatMap { case (id, _) =>
        val hits = allT.filter(t => tf2.contains((id, t)))
        if (hits.isEmpty) None
        else {
          val fp = hits.map(t => math.floor(
            contrib(tf2((id, t)), df2(t), toksOf(id).size.toLong)
              * 1048576.0).toLong).sum
          Some((id, hits.size.toLong, fp))
        }
      }.sortBy { case (id, _, fp) => (-fp, id) }.take(k)
        .map { case (id, nh, fp) => (id, nh, fp) }
      // --- operator
      val root = java.nio.file.Files
        .createTempDirectory(s"graft_prf_prop$seed").toString
      val corpus = docs.toDF("doc_id", "text")
      InvertedIndex.writePostingStore(corpus, "doc_id", "text", root, 1L)
      val prf = InvertedIndex.prfSearchFromStore(spark, root, corpus,
        "doc_id", "text", terms, fbDocs, fbTerms, k)
      val got = prf.select(col("doc_id"), col("n_terms_hit"), col("prf_fp"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
      graft.operators.Checkpoints.releasePinned(prf)
      assert(got == expect, s"seed=$seed:\n got    $got\n expect $expect")
      new org.apache.hadoop.fs.Path(root)
        .getFileSystem(spark.sessionState.newHadoopConf())
        .delete(new org.apache.hadoop.fs.Path(root), true)
    }
  }
}
