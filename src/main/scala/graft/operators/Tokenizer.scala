package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import TextFunctions.tokens

/** Tokenizer-training statistics over a document corpus — the corpus
  * passes a BPE/vocabulary trainer runs before any model sees a byte:
  * adjacent-pair counts (the statistic each BPE merge maximizes),
  * frequency-ranked vocabulary with OOV coverage, and within-document
  * co-occurrence lift.
  *
  * Scale design (100 TB corpus):
  *  - Pair/token extraction is pure map-side array arithmetic —
  *    constant allocations per document (shifted-slice `zip_with`, the
  *    [[TextFunctions.hashedShingles]] trick applied to strings), no
  *    per-pair UDF, no explode-before-filter.
  *  - Every groupBy keys on the token/pair VALUE — uniform by
  *    construction (Zipf head keys are hot but partial aggregation
  *    absorbs them map-side; the reduce side sees one partial row per
  *    (partition, key)).
  *  - Top-k selections are `orderBy(...).limit(k)` —
  *    TakeOrderedAndProject, a per-partition heap + single k-row merge
  *    on the driver, never a global sort.
  *  - The vocabulary (k rows) broadcasts back for the coverage join;
  *    the corpus side stays a single map-side pass.
  */
object Tokenizer {

  /** Adjacent whitespace-token pairs as "left right" strings, one
    * array per document; `[]` for docs with < 2 tokens. */
  def adjacentPairs(textCol: Column): Column = {
    val toks = tokens(textCol)
    val m = greatest(size(toks) - 1, lit(0))
    zip_with(slice(toks, lit(1), m), slice(toks, lit(2), m),
      (a, b) => concat(a, lit(" "), b))
  }

  /** Corpus-wide adjacent-pair frequencies: `(pair, n_pairs)`. The
    * statistic a BPE trainer maximizes for its next merge rule. */
  def pairCounts(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(adjacentPairs(col(textCol))).as("pair"))
      .groupBy(col("pair"))
      .agg(count(lit(1)).as("n_pairs"))

  /** The top-k merge candidates, deterministically tie-broken by the
    * pair string — rank 1 is the merge a BPE trainer would apply. */
  def topPairs(docs: DataFrame, textCol: String, k: Int): DataFrame =
    pairCounts(docs, textCol)
      .orderBy(col("n_pairs").desc, col("pair"))
      .limit(k)

  /** Separator for BPE symbol strings — U+001F (unit separator), a
    * control char that never appears in natural-language tokens;
    * words containing it are excluded up front (the operator's one
    * input contract, enforced, not assumed). */
  private val BpeSep = "\u001f"

  /** ITERATED BPE merge training — the actual loop [[topPairs]] only
    * scores the first step of: count adjacent CHARACTER-level symbol
    * pairs weighted by word frequency, apply the argmax merge to
    * every word, recount, `nMerges` times (Sennrich-style; pair
    * counts include overlapping occurrences, merges apply greedily
    * left-to-right non-overlapping). Returns the learned merge table
    * `(merge_rank, s1, s2, pair_count)` — the artifact a tokenizer
    * ships.
    *
    * The 100 TB design is the WORD-FREQUENCY COMPRESSION: the corpus
    * is scanned ONCE (word → count), and every training iteration
    * runs over that vocab-sized frame — training cost is independent
    * of corpus size after the first pass, which is why BPE trainers
    * scale at all. Per iteration: one partial-aggregated pair count
    * over the vocab frame, a 1-row TakeOrdered argmax to the driver,
    * and a map-side merge rewrite (localCheckpoint per round bounds
    * the lineage, the kmeans discipline; each round releases the
    * previous round's blocks).
    *
    * Cross-engine reproducibility: symbol sequences are SEPARATOR-
    * DELIMITED STRINGS (`␟c₁␟c₂␟…␟`) and a merge is one literal
    * `replace(str, ␟s1␟s2␟ → ␟s1s2␟)` — both engines' replace scans
    * left-to-right non-overlapping and continues AFTER the
    * replacement, which IS greedy BPE application, so the whole
    * training trajectory (including tie-breaks: count desc, then
    * (s1, s2) lexicographic) is bit-identical (oracle-gated, q157).
    * The bounding separators make cross-symbol false matches
    * impossible (`␟a␟b␟` cannot match inside `␟xa␟b…` — the char
    * before `a` is `x`, not `␟`). */
  def bpeTrain(docs: DataFrame, textCol: String, nMerges: Int): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val (merges, vocab) = bpeTrainCore(docs, textCol, nMerges)
    Checkpoints.releasePinned(vocab) // merges are driver-side; blocks are dead
    merges.toDF("merge_rank", "s1", "s2", "pair_count")
  }

  /** The training loop behind [[bpeTrain]] / [[bpeSegmentStats]]:
    * returns the learned merges AND the final vocab frame
    * `(word, cnt, str)` — `str` is each distinct word's fully-merged
    * segmentation, still pinned (the CALLER owns the release). */
  private def bpeTrainCore(docs: DataFrame, textCol: String,
      nMerges: Int): (Seq[(Int, String, String, Long)], DataFrame) = {
    require(nMerges >= 1, s"need nMerges >= 1, got $nMerges")
    val charArr = transform(sequence(lit(1), length(col("word"))),
      i => col("word").substr(i, lit(1)))
    var vocab = docs.select(explode(tokens(col(textCol))).as("word"))
      .filter(!col("word").contains(BpeSep))
      .groupBy(col("word")).agg(count(lit(1)).as("cnt"))
      .select(col("word"), col("cnt"),
        concat(lit(BpeSep), concat_ws(BpeSep, charArr), lit(BpeSep)).as("str"))
      .localCheckpoint()
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    var exhausted = false
    var round = 1
    while (round <= nMerges && !exhausted) {
      val syms = filter(split(col("str"),
        java.util.regex.Pattern.quote(BpeSep)), s => s =!= "")
      val m = greatest(size(syms) - 1, lit(0))
      val best = vocab
        .select(col("cnt"), explode(zip_with(
          slice(syms, lit(1), m), slice(syms, lit(2), m),
          (a, b) => struct(a.as("s1"), b.as("s2")))).as("p"))
        .groupBy(col("p.s1").as("s1"), col("p.s2").as("s2"))
        .agg(sum(col("cnt")).as("c"))
        .orderBy(col("c").desc, col("s1"), col("s2"))
        .limit(1).collect()
      if (best.isEmpty) exhausted = true // every word fully merged
      else {
        val (s1, s2, c) =
          (best(0).getString(0), best(0).getString(1), best(0).getLong(2))
        merges += ((round, s1, s2, c))
        val next = vocab.withColumn("str", call_function("replace",
            col("str"), lit(BpeSep + s1 + BpeSep + s2 + BpeSep),
            lit(BpeSep + s1 + s2 + BpeSep)))
          .localCheckpoint()
        Checkpoints.releasePinned(vocab)
        vocab = next
        round += 1
      }
    }
    (merges.toSeq, vocab)
  }

  /** BPE SEGMENTATION statistics — the apply half of the tokenizer
    * [[bpeTrain]] learns: segment the corpus with the trained merges
    * and report, per group, the compression the vocabulary buys
    * (`chars_per_token` — the number a tokenizer team actually
    * tracks per language/source when sizing a vocab).
    *
    * The apply side inherits the trainer's word-frequency
    * compression: each DISTINCT word is segmented ONCE (its final
    * `str` already sits in the trained vocab frame), and the corpus
    * pass is an explode + equi-join on the word value — no per-
    * occurrence re-segmentation, no driver loop. At 100 TB the join
    * shuffles (vocab can be 100M+ rows); the word key is Zipf-hot
    * but the aggregate above it is partial, and a broadcast variant
    * is a one-line swap when the vocab is capped. Words containing
    * the separator are excluded by the trainer's contract and
    * therefore drop from the stats (inner join), identically in the
    * oracle.
    *
    * Columns per group: `n_words` (occurrences), `total_chars`,
    * `total_bpe_tokens`, `chars_per_token`. */
  def bpeSegmentStats(docs: DataFrame, textCol: String,
      groupCols: Seq[String], nMerges: Int): DataFrame = {
    val (_, vocab) = bpeTrainCore(docs, textCol, nMerges)
    val nSyms = size(filter(split(col("str"),
      java.util.regex.Pattern.quote(BpeSep)), s => s =!= ""))
    val seg = vocab.select(col("word"), nSyms.cast("long").as("n_syms"))
    val words = docs.select(
      groupCols.map(col) :+ explode(tokens(col(textCol))).as("word"): _*)
    val out = words.join(seg, Seq("word"))
      .groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n_words"),
        sum(length(col("word")).cast("long")).as("total_chars"),
        sum(col("n_syms")).as("total_bpe_tokens"))
      .withColumn("chars_per_token",
        col("total_chars").cast("double") / col("total_bpe_tokens"))
    // the stats plan references the pinned vocab lazily; hand the
    // release to the caller's consumption via Bench.releaseBlocks —
    // eager release here would truncate the un-executed plan
    out
  }

  /** Frequency-ranked vocabulary: the `vocabSize` most frequent
    * tokens (ties broken by token string), with occurrence counts. */
  def vocabulary(docs: DataFrame, textCol: String, vocabSize: Int): DataFrame =
    docs.select(explode(tokens(col(textCol))).as("token"))
      .groupBy(col("token"))
      .agg(count(lit(1)).as("n_occurrences"))
      .orderBy(col("n_occurrences").desc, col("token"))
      .limit(vocabSize)

  /** Per-group OOV coverage of a frequency-capped vocabulary:
    * `(group..., n_tokens, n_oov, oov_rate)` where `n_oov` counts
    * token OCCURRENCES outside the top-`vocabSize` vocabulary.
    *
    * The vocabulary is k rows and broadcast; the corpus pass is one
    * map-side explode + broadcast left join (no corpus shuffle before
    * the final per-group rollup).
    */
  def vocabCoverage(docs: DataFrame, textCol: String, groupCols: Seq[String],
      vocabSize: Int): DataFrame = {
    val vocab = vocabulary(docs, textCol, vocabSize)
      .select(col("token"), lit(true).as("in_vocab"))
    val occurrences = docs.select(
      groupCols.map(col) :+ explode(tokens(col(textCol))).as("token"): _*)
    occurrences
      .join(broadcast(vocab), Seq("token"), "left")
      .groupBy(groupCols.map(col): _*)
      .agg(
        count(lit(1)).as("n_tokens"),
        sum(when(col("in_vocab").isNull, 1L).otherwise(0L)).as("n_oov"))
      .withColumn("oov_rate",
        col("n_oov").cast("double") / col("n_tokens"))
  }

  /** Top-k most similar document pairs by raw term-frequency dot
    * product — the SPARSE counterpart of [[Similarity]]'s dense ANN,
    * via an inverted-index self-join: `(token → postings)` joined with
    * itself on the token, never a dense all-pairs product.
    *
    * Tokens with document frequency above `maxDf` are pruned BEFORE
    * pair generation — the classic stopword guard: a token appearing
    * in half the corpus contributes O(n²) pairs; with the cap each
    * token contributes ≤ maxDf² and the join is bounded by
    * Σ_token df². Integer arithmetic end-to-end (tf counts, integer
    * products), so the scores are oracle-exact; the final top-k is
    * TakeOrderedAndProject with ties broken on the (a, b) pair.
    *
    * Shape (100 TB): tf and df aggregate on the token key (Zipf-hot
    * heads absorbed by map-side partial aggregation); the df filter
    * joins on the same token partitioning (exchange reuse — no extra
    * corpus shuffle); the pair aggregation keys on (doc_a, doc_b). */
  def tokenDotTopK(docs: DataFrame, idCol: String, textCol: String,
      maxDf: Long, k: Int): DataFrame = {
    val tf = docs
      .select(col(idCol).as("doc"), explode(tokens(col(textCol))).as("token"))
      .groupBy(col("token"), col("doc")).agg(count(lit(1)).as("tf"))
    val keep = tf.groupBy(col("token")).agg(count(lit(1)).as("df"))
      .filter(col("df") <= maxDf)
      .select(col("token"))
    val kept = tf.join(keep, Seq("token"))
    val a = kept.select(col("token"), col("doc").as("doc_a"), col("tf").as("tf_a"))
    val b = kept.select(col("token"), col("doc").as("doc_b"), col("tf").as("tf_b"))
    a.join(b, Seq("token"))
      .filter(col("doc_a") < col("doc_b"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(sum(col("tf_a") * col("tf_b")).as("dot"))
      .orderBy(col("dot").desc, col("doc_a"), col("doc_b"))
      .limit(k)
  }

  /** [[tokenDotTopK]] with the df cap RELATIVE to corpus size
    * (`df ≤ maxDfFraction · n_docs`) — the form a growing corpus
    * needs: an absolute cap silently loosens as the corpus scales
    * (SCALE.md measured the super-linear drift at 10×), while a
    * fractional cap keeps the pruned-list population, and so the
    * pair-generation cost, proportional to the data. The cap stays a
    * `Long` end-to-end: at the trillion-doc scale this variant exists
    * for, an `Int` cap would saturate and silently disable the prune. */
  def tokenDotTopKRelative(docs: DataFrame, idCol: String, textCol: String,
      maxDfFraction: Double, k: Int): DataFrame = {
    require(maxDfFraction > 0 && maxDfFraction <= 1,
      s"maxDfFraction must be in (0,1], got $maxDfFraction")
    val n = docs.count()
    tokenDotTopK(docs, idCol, textCol,
      math.max(1L, math.floor(maxDfFraction * n).toLong), k)
  }

  /** Document-level co-occurrence lift between the `vocabSize` tokens
    * with the highest document frequency:
    * `(token_a, token_b, n_both, df_a, df_b, lift)` for every pair
    * (a < b) co-occurring in at least one document, where
    * `lift = n_both * n_docs / (df_a * df_b)` — the PMI ratio WITHOUT
    * the logarithm, so the score is one exact integer product per pair
    * followed by a single double division (bit-identical across
    * engines; the log is monotone, so ranking is unchanged).
    *
    * Shape: two heavy corpus passes (rank the vocabulary; extract the
    * kept tokens) plus a doc_id-column count. The ≤ `vocabSize`-row
    * vocabulary is localCheckpoint'd so its three plan references cost
    * one aggregation, then broadcast into every join; pair generation
    * is array arithmetic over each document's ≤ `vocabSize` retained
    * tokens — never an exploded self-join of the corpus. Lifecycle:
    * the pinned vocab blocks are k rows; long-lived callers release
    * via [[Checkpoints.releasePinned]] once done (the bench sweeps
    * between runs).
    */
  def cooccurrenceLift(docs: DataFrame, idCol: String, textCol: String,
      vocabSize: Int): DataFrame = {
    val tokd = docs.select(col(idCol),
      explode(array_distinct(tokens(col(textCol)))).as("token"))
    val vocab = tokd
      .groupBy(col("token")).agg(count(lit(1)).as("df"))
      .orderBy(col("df").desc, col("token"))
      .limit(vocabSize)
      .localCheckpoint(true)

    // Corpus pass 2: keep only vocabulary tokens (broadcast hash
    // join, map-side), re-assemble the ≤ vocabSize survivors per doc,
    // then emit all (i < j) pairs from the sorted array. The groupBy
    // shuffles only the kept rows — ≤ vocabSize per document.
    val kept = tokd.join(broadcast(vocab.select(col("token"))), Seq("token"))
    val byDoc = kept.groupBy(col(idCol))
      .agg(sort_array(collect_list(col("token"))).as("vt"))
    val vt = col("vt")
    val pairsOfDoc = when(size(vt) >= 2,
      flatten(transform(sequence(lit(1), size(vt) - 1), i =>
        transform(sequence(i + 1, size(vt)), j =>
          struct(element_at(vt, i).as("token_a"),
            element_at(vt, j).as("token_b"))))))
      .otherwise(array().cast("array<struct<token_a:string,token_b:string>>"))
    val pairs = byDoc.select(explode(pairsOfDoc).as("p"))
      .select(col("p.token_a"), col("p.token_b"))

    val nDocs = docs.agg(count(lit(1)).as("n_docs"))
    pairs
      .groupBy(col("token_a"), col("token_b"))
      .agg(count(lit(1)).as("n_both"))
      .join(broadcast(vocab.select(col("token").as("token_a"), col("df").as("df_a"))), Seq("token_a"))
      .join(broadcast(vocab.select(col("token").as("token_b"), col("df").as("df_b"))), Seq("token_b"))
      .crossJoin(broadcast(nDocs))
      .select(col("token_a"), col("token_b"), col("n_both"), col("df_a"), col("df_b"),
        ((col("n_both") * col("n_docs")).cast("double") / (col("df_a") * col("df_b")))
          .as("lift"))
  }
}
