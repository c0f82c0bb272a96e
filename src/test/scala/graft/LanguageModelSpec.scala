package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.LanguageModel

/** Round-11: bigram-LM quality scoring — smoothing on unseen text,
  * store-merge equivalence, and the signal DIRECTION (garbled text
  * must score below in-domain text — the floor that makes the
  * operator a quality filter rather than a number generator).
  */
class LanguageModelSpec extends AnyFunSuite {
  lazy val spark = Sessions.local(4)

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private def rm(root: String): Unit =
    new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sessionState.newHadoopConf())
      .delete(new org.apache.hadoop.fs.Path(root), true)

  test("fully-unseen candidate text scores exactly the Laplace floor; sub-2-token docs are absent") {
    import spark.implicits._
    // train: 3 docs over a tiny vocab; V = distinct continuations
    // {b, c} = 2
    val train = Seq((1L, "a b c"), (2L, "a b"), (3L, "b c")).toDF("doc_id", "text")
    val cand = Seq(
      (10L, "x y z"),   // 2 bigrams, both unseen, lefts unseen
      (11L, "q"),       // single token: no sequence to judge
      (12L, "   "))     // zero tokens
      .toDF("doc_id", "text")
    val counts = LanguageModel.bigramCounts(train, "doc_id", "text")
    val got = LanguageModel.bigramLmScore(cand, counts, "doc_id", "text", 10)
      .as[(Long, Long, Long, Double)].collect().toSeq
    // floor((0+1)·2^30/(0+2)) = 536870912 per bigram
    assert(got == Seq((10L, 2L, 1073741824L, 536870912.0)),
      s"expected only doc 10 at the smoothing floor, got $got")
  }

  test("store of per-slice count deltas scores identically to single-shot training") {
    import spark.implicits._
    val docs = (1L to 40L).map { i =>
      (i, s"tok${i % 7} tok${(i + 1) % 7} tok${(i + 2) % 5} tail${i % 3}")
    }.toDF("doc_id", "text")
    val train = docs.filter(col("doc_id") <= 30)
    val cand = docs.filter(col("doc_id") > 30)
    val direct = LanguageModel.bigramLmScore(cand,
      LanguageModel.bigramCounts(train, "doc_id", "text"),
      "doc_id", "text", 10).collect().toSeq
    val root = tmp("graft_lm_store")
    LanguageModel.writeLmStore(
      train.filter(col("doc_id") % 2 === 0), "doc_id", "text", root, 1L)
    LanguageModel.writeLmStore(
      train.filter(col("doc_id") % 2 === 1), "doc_id", "text", root, 2L)
    val stored = LanguageModel.bigramLmScoreFromStore(
      spark, root, cand, "doc_id", "text", 10).collect().toSeq
    assert(stored == direct,
      s"merged store must equal single-shot training\n got    $stored\n direct $direct")
    rm(root)
  }

  test("signal direction: garbled text ranks strictly below in-domain text") {
    import spark.implicits._
    // train: repetitive in-domain prose over a small vocab
    val train = (1L to 50L).map { i =>
      (i, s"the cat sat on the mat and the dog ran to the cat")
    }.toDF("doc_id", "text")
    val cand = Seq(
      (100L, "the cat sat on the mat"),        // in-domain
      (101L, "mat the on sat cat the"),        // same tokens, wrong order
      (102L, "zx qv wk jj pf lr"))             // non-language
      .toDF("doc_id", "text")
    val counts = LanguageModel.bigramCounts(train, "doc_id", "text")
    val byId = LanguageModel
      .bigramLmScore(cand, counts, "doc_id", "text", 10)
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    // Pure Laplace (no backoff) does NOT order the two degenerate
    // cases against each other: an unseen pair under a FREQUENT seen
    // context scores 1/(cl+V), which is BELOW the 1/V an entirely
    // unseen context gets — so shuffled in-domain tokens can rank
    // under pure noise. The guarantee the filter rests on is that
    // in-domain text beats BOTH.
    assert(byId(100L) > byId(101L) && byId(100L) > byId(102L),
      s"in-domain text must outscore shuffled and garbled text, got $byId")
    // stupid backoff restores the full ordering: an unseen
    // continuation scores by ITS OWN corpus frequency (0.4·cr/N), so
    // shuffled in-domain tokens beat noise — the Laplace artifact gone
    val sb = LanguageModel
      .stupidBackoffScore(cand, counts, "doc_id", "text", 10)
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(sb(102L) < sb(101L) && sb(101L) < sb(100L),
      s"backoff must order garbled < shuffled < in-domain, got $sb")
  }

  test("scoring reads each corpus file exactly once: training pass + candidate pass, counts never re-scanned") {
    import spark.implicits._
    val dir = tmp("graft_lm_onepass")
    (1L to 50L).map(i => (i, s"tok${i % 7} tok${(i + 1) % 7} tok${(i + 2) % 5}"))
      .toDF("doc_id", "text").coalesce(1)
      .write.parquet(s"$dir/train")
    (100L to 119L).map(i => (i, s"tok${i % 7} tok${(i + 3) % 7}"))
      .toDF("doc_id", "text").coalesce(1)
      .write.parquet(s"$dir/cand")
    val train = spark.read.parquet(s"$dir/train")
    val cand = spark.read.parquet(s"$dir/cand")
    val nCounts = LanguageModel.bigramCounts(train, "doc_id", "text").count()
    val (rows, m) = Metrics.capture(spark) {
      LanguageModel.bigramLmScore(cand,
        LanguageModel.bigramCounts(train, "doc_id", "text"),
        "doc_id", "text", 10).collect()
    }
    // recordsRead counts BOTH file scans and checkpoint-block reads,
    // which makes this pin exact: 50 train rows once (the counts
    // barrier's materialization), 20 candidate rows once, each of the
    // THREE count consumers (the (w1,w2) join, the left-count re-agg,
    // V) reads the counts-type-sized materialized frame — the corpus
    // is never re-scanned by a derivation — and the collect reads the
    // scorer's own k-row result checkpoint (the round-12 lifecycle:
    // the counts pin is released inside the scorer, so the result
    // checkpoint is the call's only retained state)
    assert(m.inputRecords == 70 + 3 * nCounts + rows.length,
      s"expected 70 corpus + 3×$nCounts count-frame + ${rows.length} " +
        s"result records, read ${m.inputRecords}")
    rm(dir)
  }

  test("trained lang-id separates classes with distinct character statistics; heuristic-blind text still classified") {
    import spark.implicits._
    // three synthetic "languages" with disjoint character inventories
    // — no stopword list knows them, TextAnalysis.langId would return
    // 'und' on all of this
    def doc(lang: String, i: Long) = lang match {
      case "aa" => (i, lang, s"abra abac adab car$i abba")
      case "bb" => (i, lang, s"bolbo bubbo obbol bon$i lobbo")
      case "cc" => (i, lang, s"cicci cocci iccoc cim$i occi")
    }
    val train = (1L to 60L).map(i =>
      doc(Seq("aa", "bb", "cc")((i % 3).toInt), i)).toDF("doc_id", "lang", "text")
    val cand = Seq(
      (100L, "aa", "abac adab abra"),
      (101L, "bb", "obbol bubbo"),
      (102L, "cc", "cocci iccoc cicci"))
      .toDF("doc_id", "lang", "text")
    val counts = LanguageModel.langTrigramCounts(train, "lang", "text")
    val pred = LanguageModel
      .classifyLangByTrigrams(cand, counts, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(pred == Map(100L -> "aa", 101L -> "bb", 102L -> "cc"),
      s"trained trigram model failed to separate distinct classes: $pred")
  }

  test("trained lang-id: exact missing-mass arithmetic — unseen trigrams add the per-class floor") {
    import spark.implicits._
    // one class, one training doc "abcd" → trigrams abc, bcd; cl=2, V=2
    val train = Seq((1L, "xx", "abcd")).toDF("doc_id", "lang", "text")
    // candidate "abcz": trigrams abc (seen c=1), bcz, (czX none) → n_tri=2, n_seen=1
    val cand = Seq((10L, "abcz")).toDF("doc_id", "text")
    val counts = LanguageModel.langTrigramCounts(train, "lang", "text")
    val got = LanguageModel
      .classifyLangByTrigrams(cand, counts, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    val seenC = math.floor(2.0 * 1073741824.0 / 4.0).toLong  // (1+1)·2^30/(2+2)
    val floor0 = math.floor(1.0 * 1073741824.0 / 4.0).toLong // 1·2^30/(2+2)
    assert(got == Seq((10L, "xx", seenC + floor0)),
      s"expected seen=$seenC + floor0=$floor0, got $got")
  }

  test("trigram backoff: exact cases for all three chain levels, zero, and the 3-token floor") {
    import spark.implicits._
    // trigram counts: (a,b,c)=2, (a,b,d)=1; bigram counts: (a,b)=3,
    // (b,c)=2, (b,d)=1; cl(b)=3; cr(c)=2; N=6
    val train = Seq((1L, "a b c"), (2L, "a b c"), (3L, "a b d"))
      .toDF("doc_id", "text")
    val cand = Seq(
      (10L, "a b c"),  // seen trigram: MLE c123/c12
      (11L, "x b c"),  // unseen trigram, seen bigram (b,c): 0.4·c23/cl(b)
      (12L, "x y c"),  // both unseen, c seen as continuation: 0.4²·cr(c)/N
      (13L, "x y z"),  // z never a continuation: 0
      (14L, "a b"))    // 2 tokens: no trigram to judge — absent
      .toDF("doc_id", "text")
    val got = LanguageModel.trigramBackoffScore(cand,
        LanguageModel.trigramCounts(train, "doc_id", "text"),
        LanguageModel.bigramCounts(train, "doc_id", "text"),
        "doc_id", "text", 10)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val fp = 1073741824.0
    assert(got == Map(
      10L -> math.floor(2.0 * fp / 3.0).toLong,
      11L -> math.floor(0.4 * (2.0 * fp / 3.0)).toLong,
      12L -> math.floor(0.4 * (0.4 * (2.0 * fp / 6.0))).toLong,
      13L -> 0L), s"exact trigram-backoff cases drifted: $got")
  }

  test("trigram backoff orders garbled < shuffled < in-domain (the n=3 re-proof)") {
    import spark.implicits._
    val train = (1L to 50L).map { i =>
      (i, "the cat sat on the mat and the dog ran to the cat")
    }.toDF("doc_id", "text")
    val cand = Seq(
      (100L, "the cat sat on the mat"), // in-domain: seen trigrams (MLE level)
      (101L, "mat the on sat cat the"), // unseen tri+bi, known tokens (0.4² level)
      (102L, "zx qv wk jj pf lr"))      // tokens never continuations: 0
      .toDF("doc_id", "text")
    val sb3 = LanguageModel.trigramBackoffScore(cand,
        LanguageModel.trigramCounts(train, "doc_id", "text"),
        LanguageModel.bigramCounts(train, "doc_id", "text"),
        "doc_id", "text", 10)
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(sb3(102L) < sb3(101L) && sb3(101L) < sb3(100L),
      s"trigram backoff must order garbled < shuffled < in-domain, got $sb3")
  }

  test("LM-store erasure: negated deltas serve identically to retraining on the remaining corpus; compaction folds them physically") {
    import spark.implicits._
    val docs = (1L to 40L).map { i =>
      (i, s"tok${i % 7} tok${(i + 1) % 7} tok${(i + 2) % 5} tail${i % 3}")
    }.toDF("doc_id", "text")
    val a = docs.filter(col("doc_id") <= 20)
    val b = docs.filter(col("doc_id") > 20 && col("doc_id") <= 30)
    val cand = docs.filter(col("doc_id") > 30)
    val erased = a.filter(col("doc_id") % 5 === 0) // 4 docs out of batch 1
    val remaining = a.filter(col("doc_id") % 5 =!= 0).unionByName(b)
    val direct = LanguageModel.bigramLmScore(cand,
      LanguageModel.bigramCounts(remaining, "doc_id", "text"),
      "doc_id", "text", 10).collect().toSeq
    val root = tmp("graft_lm_erase")
    LanguageModel.writeLmStore(a, "doc_id", "text", root, 1L)
    LanguageModel.writeLmStore(b, "doc_id", "text", root, 2L)
    LanguageModel.deleteFromLmStore(erased, "doc_id", "text", root, 3L)
    // the negatives net out on the next serve — no retraining
    val served = LanguageModel.bigramLmScoreFromStore(
      spark, root, cand, "doc_id", "text", 10).collect().toSeq
    assert(served == direct,
      s"served-after-delete must equal retrain-on-remaining\n got    $served\n direct $direct")
    // backoff serves from the SAME store, same identity
    val sbDirect = LanguageModel.stupidBackoffScore(cand,
      LanguageModel.bigramCounts(remaining, "doc_id", "text"),
      "doc_id", "text", 10).collect().toSeq
    val sbServed = LanguageModel.stupidBackoffScoreFromStore(
      spark, root, cand, "doc_id", "text", 10).collect().toSeq
    assert(sbServed == sbDirect, "backoff-from-store drifted after the delete")
    // maintenance: the fold is physical — one batch dir, counts equal
    // retraining's EXACTLY (no zero/negative residue), serve unchanged
    assert(LanguageModel.compactLmStore(spark, root, 4L) == 3)
    val after = LanguageModel.bigramLmScoreFromStore(
      spark, root, cand, "doc_id", "text", 10).collect().toSeq
    assert(after == direct, "compaction changed served scores")
    val stored = operators.BatchStore.read(spark, root)
      .select(col("w1"), col("w2"), col("cnt"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      .toSet
    val expect = LanguageModel.bigramCounts(remaining, "doc_id", "text")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      .toSet
    assert(stored == expect,
      "compacted store must hold exactly the remaining corpus's counts")
    rm(root)
  }

  test("lang-id store: append + erase + compact serves the exact-argmax classifier identically to in-memory training on the remaining slices") {
    import spark.implicits._
    def doc(lang: String, i: Long) = lang match {
      case "aa" => (i, lang, s"abra abac adab car$i abba")
      case "bb" => (i, lang, s"bolbo bubbo obbol bon$i lobbo")
      case _    => (i, lang, s"cicci cocci iccoc cim$i occi")
    }
    val train = (1L to 60L).map(i =>
      doc(Seq("aa", "bb", "cc")((i % 3).toInt), i)).toDF("doc_id", "lang", "text")
    val cand = Seq((100L, "abac adab abra"), (101L, "obbol bubbo"),
      (102L, "cocci iccoc cicci")).toDF("doc_id", "text")
    val erased = train.filter(col("doc_id") % 4 === 0)
    val remaining = train.filter(col("doc_id") % 4 =!= 0)
    val direct = LanguageModel.classifyLangByTrigrams(cand,
        LanguageModel.langTrigramCounts(remaining, "lang", "text"),
        "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    val root = tmp("graft_langid_store")
    LanguageModel.writeLangIdStore(
      train.filter(col("doc_id") <= 30), "lang", "text", root, 1L)
    LanguageModel.writeLangIdStore(
      train.filter(col("doc_id") > 30), "lang", "text", root, 2L)
    LanguageModel.deleteFromLangIdStore(erased, "lang", "text", root, 3L)
    val served = LanguageModel.classifyLangByTrigramsFromStore(
        spark, root, cand, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(served == direct,
      s"served-after-delete must equal retrain-on-remaining\n got    $served\n direct $direct")
    assert(LanguageModel.compactLangIdStore(spark, root, 4L) == 3)
    val after = LanguageModel.classifyLangByTrigramsFromStore(
        spark, root, cand, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(after == direct, "compaction changed served classifications")
    rm(root)
  }

  test("stupid backoff: exact seen-MLE, backoff, and zero cases") {
    import spark.implicits._
    // train: "a b" ×3, "a c" ×1 → cl(a)=4, cr(b)=3, cr(c)=1, N=4
    val train = Seq((1L, "a b"), (2L, "a b"), (3L, "a b"), (4L, "a c"))
      .toDF("doc_id", "text")
    val cand = Seq(
      (10L, "a b"),  // seen: floor(3·2^30/4)
      (11L, "x b"),  // unseen pair, seen continuation: floor(0.4·(3·2^30/4))
      (12L, "x y"))  // continuation never seen: 0
      .toDF("doc_id", "text")
    val counts = LanguageModel.bigramCounts(train, "doc_id", "text")
    val got = LanguageModel
      .stupidBackoffScore(cand, counts, "doc_id", "text", 10)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val mle = 3.0 * 1073741824.0 / 4.0
    assert(got == Map(
      10L -> mle.toLong,
      11L -> math.floor(0.4 * mle).toLong,
      12L -> 0L), s"exact backoff cases drifted: $got")
  }

  test("erasure-contract violation fails loudly at compaction: a double-delete's negative net count aborts the fold") {
    import spark.implicits._
    // per-doc-unique tokens: each bigram/trigram key has count 1, so
    // a double-delete nets it to -1 (shared tokens could mask the
    // violation behind surviving docs' positive counts)
    val docs = (1L to 20L).map { i =>
      (i, f"u${i}%02da u${i}%02db u${i}%02dc")
    }.toDF("doc_id", "text")
    val erased = docs.filter(col("doc_id") % 4 === 0)
    val root = tmp("graft_lm_doubledel")
    LanguageModel.writeLmStore(docs, "doc_id", "text", root, 1L)
    LanguageModel.deleteFromLmStore(erased, "doc_id", "text", root, 2L)
    // contract violation: the same docs erased AGAIN — some (w1,w2)
    // nets go negative, which has no corpus meaning
    LanguageModel.deleteFromLmStore(erased, "doc_id", "text", root, 3L)
    val ex = intercept[Exception] {
      LanguageModel.compactLmStore(spark, root, 4L)
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e =>
        Option(e.getMessage).toSeq ++ messages(e.getCause))
    assert(messages(ex).exists(_.contains("negative net count")),
      s"compaction must name the contract violation, got: $ex")
    rm(root)

    // same discipline on the lang-id store
    val labeled = docs.withColumn("lang",
      when(col("doc_id") % 2 === 0, "aa").otherwise("bb"))
    val root2 = tmp("graft_lid_doubledel")
    LanguageModel.writeLangIdStore(labeled, "lang", "text", root2, 1L)
    LanguageModel.deleteFromLangIdStore(
      labeled.filter(col("doc_id") % 4 === 0), "lang", "text", root2, 2L)
    LanguageModel.deleteFromLangIdStore(
      labeled.filter(col("doc_id") % 4 === 0), "lang", "text", root2, 3L)
    val ex2 = intercept[Exception] {
      LanguageModel.compactLangIdStore(spark, root2, 4L)
    }
    assert(messages(ex2).exists(_.contains("negative net count")),
      s"lang-id compaction must name the contract violation, got: $ex2")
    rm(root2)
  }

  test("lmQualityFilter: per-group cutoffs are independent; keep fraction follows cutQ; pins released") {
    import spark.implicits._
    // group A: 16 docs whose in-domain fraction GROWS with j (scores
    // strictly increase); group B: 8 docs junkier than all of A's
    // keepers (scores strictly decrease with k) — a global threshold
    // would gut B, per-group cuts keep each group's own top share
    val train = (1 to 20).map(i =>
      (i.toLong, s"the cat sat on the mat chapter $i")).toDF("doc_id", "text")
    val cand = (
      (1 to 16).map(j => (100L + j, "A",
        Seq.fill(j)("the cat").mkString(" ") + s" zz$j qq$j")) ++
      (1 to 8).map(k => (300L + k, "B",
        "the cat " + Seq.fill(k)("xx").mkString(" ")))
    ).toDF("doc_id", "src", "text")
    // compare pinned-RDD ID SETS, not counts: the ContextCleaner may
    // asynchronously unpersist a dead RDD from an earlier test between
    // the captures, which makes a count-based delta flaky
    def pinnedIds: Set[Int] = spark.sparkContext.getPersistentRDDs.keySet.toSet
    val before = pinnedIds
    val kept = LanguageModel.lmQualityFilter(cand,
      LanguageModel.bigramCounts(train, "doc_id", "text"),
      "doc_id", "text", "src", cutQ = 0.5)
    val rows = kept.select(col("doc_id"), col("src"))
      .as[(Long, String)].collect().toSeq
    assert((pinnedIds -- before).size == 1,
      "after a call, only the returned frame may be newly pinned")
    graft.operators.Checkpoints.releasePinned(kept)
    assert((pinnedIds -- before).isEmpty,
      "each call must release every internal pin")
    // group A: ascending rank ceil(0.5·16) = 8 → keep scores ≥ the
    // 8th — exactly j ∈ [8, 16] (scores strictly increase with j)
    val a = rows.filter(_._2 == "A").map(_._1 - 100L).sorted
    assert(a == (8L to 16L), s"A must keep its top 9 by score, got $a")
    // group B keeps by its OWN cutoff (rank ceil(0.5·8) = 4 of its
    // descending-in-k scores → k ∈ [1, 5]) even though every B doc
    // scores below A's cutoff doc
    val b = rows.filter(_._2 == "B").map(_._1 - 300L).sorted
    assert(b == (1L to 5L), s"B must keep its own top 5, got $b")
  }

  test("lmStoreSink: epoch replay is a no-op; the streamed store equals single-shot training") {
    import spark.implicits._
    val root = tmp("graft_lm_sink")
    val b0 = Seq((1L, "a b c a b"), (2L, "b c")).toDF("doc_id", "text")
    val b1 = Seq((3L, "c a b"), (4L, "q")).toDF("doc_id", "text")
    val sink = LanguageModel.lmStoreSink("doc_id", "text", root)
    sink(b0, 0L); sink(b1, 1L)
    def stored() = graft.operators.BatchStore.read(spark, root)
      .orderBy(col("batch"), col("w1"), col("w2")).collect().toSeq
    val s0 = stored()
    // at-least-once delivery: replaying both epochs changes NOTHING —
    // a re-appended count delta would double every replayed bigram
    sink(b0, 0L); sink(b1, 1L)
    assert(stored() == s0, "epoch replay must be a no-op")
    // serving from the streamed store == single-shot training on the
    // concatenated batches (counts merge by SUM, epoch chunking is
    // invisible)
    val cand = Seq((10L, "a b x"), (11L, "c c")).toDF("doc_id", "text")
    val streamed = LanguageModel.bigramLmScoreFromStore(
      spark, root, cand, "doc_id", "text", 10).collect().toSeq
    val direct = LanguageModel.bigramLmScore(cand,
      LanguageModel.bigramCounts(b0.union(b1), "doc_id", "text"),
      "doc_id", "text", 10).collect().toSeq
    assert(streamed == direct,
      s"streamed store must equal single-shot\n got    $streamed\n direct $direct")
    rm(root)
  }
}
