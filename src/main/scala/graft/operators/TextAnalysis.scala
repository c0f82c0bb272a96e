package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import TextFunctions._

/** Text-analysis operators for training-data curation: per-document
  * statistics, quality scoring, n-gram-heuristic language id, and
  * content fingerprinting. Everything is a built-in column expression
  * (map-side, codegen'd, no shuffle except user-requested aggregation).
  */
object TextAnalysis {

  /** Function-word evidence lists for the language-id heuristic. */
  val langStopwords: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "in", "is", "a"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein"),
    "es" -> Seq("el", "la", "los", "las", "es", "y", "un"),
    "fr" -> Seq("le", "la", "les", "et", "est", "un", "une"),
    "zh" -> Seq("的", "是", "了", "在", "我", "有", "他"))

  /** Per-doc statistics: token count, char count, alpha ratio, average
    * word length. */
  def docStats(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = col(textCol)
    val toks = tokens(t)
    df.select(
      col(idCol),
      size(toks).cast("long").as("n_tokens"),
      length(t).cast("long").as("n_chars"),
      (length(regexp_replace(t, "[^A-Za-z]", "")).cast("double") /
        nullif(length(t), lit(0))).as("alpha_ratio"),
      (aggregate(toks, lit(0L), (acc, w) => acc + length(w)).cast("double") /
        nullif(size(toks), lit(0))).as("avg_word_len"))
  }

  /** Heuristic quality score in [0,1]: rewards mid-length documents,
    * alphabetic content, moderate word length, and stopword presence;
    * penalizes punctuation walls. Weights are fixed and documented so
    * the DuckDB oracle reproduces them exactly. */
  def qualityScore(textCol: Column): Column = {
    val t = textCol
    val toks = tokens(t)
    val nTok = size(toks).cast("double")
    val alphaRatio = length(regexp_replace(t, "[^A-Za-z]", "")).cast("double") /
      nullif(length(t), lit(0))
    val punctRatio = length(regexp_replace(t, "[^.,!?;:]", "")).cast("double") /
      nullif(length(t), lit(0))
    val stopHits = size(filter(toks,
      w => lower(w).isin(langStopwords.flatMap(_._2).filter(_.forall(_ < 128)): _*)))
    val stopRatio = stopHits.cast("double") / nullif(size(toks), lit(0))
    val lengthTerm = least(nTok / 64.0, lit(1.0))
    // No rounding: per-row scalar arithmetic in a fixed order is
    // bit-deterministic, so the oracle mirrors the expression verbatim.
    least(lit(1.0), greatest(lit(0.0),
      lengthTerm * 0.3 + coalesce(alphaRatio, lit(0.0)) * 0.4 +
        least(coalesce(stopRatio, lit(0.0)) * 4, lit(1.0)) * 0.2 +
        (lit(1.0) - least(coalesce(punctRatio, lit(0.0)) * 10, lit(1.0))) * 0.1))
  }

  /** N-gram/function-word language id: per language, count token hits
    * in its evidence list; highest count wins (ties broken by language
    * code order); zero evidence → "und".
    *
    * The argmax is a higher-order `aggregate` fold over an array of
    * (lang, score) structs, NOT a nested when-chain: a when-chain
    * re-expands every score expression (and its tokenization) at each
    * comparison — measured ~30× per-row recomputation — while lambda
    * variables in the fold reference each score exactly once. */
  def langId(textCol: Column): Column = {
    val toks = transform(tokens(textCol), w => lower(w))
    val pairs = array(langStopwords.map { case (lang, words) =>
      struct(lit(lang).as("lang"),
        size(filter(toks, w => w.isin(words: _*))).as("s"))
    }: _*)
    val best = aggregate(pairs,
      struct(lit("und").as("lang"), lit(0).as("s")),
      (acc, p) => when(p.getField("s") > acc.getField("s"), p).otherwise(acc))
    best.getField("lang")
  }

  /** Repetition statistics per document — the Gopher/C4-style signals
    * that catch boilerplate and degenerate generations which length or
    * stopword heuristics miss: a page of "buy now buy now …" has
    * perfect alpha ratio and fine length but collapses under
    * distinct-token and top-token-multiplicity tests.
    *
    * Columns: `n_tokens`, `n_distinct`, `top_token_count` (max
    * multiplicity of any single token), `distinct_ratio`,
    * `top_token_frac`. All map-side built-in expressions; the max
    * multiplicity is a linear fold over the SORTED token array (equal
    * tokens are adjacent → longest run = highest count), keeping the
    * whole computation inside codegen with zero per-row allocation
    * beyond the sort. */
  def repetitionStats(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = tokens(col(textCol))
    val sorted = array_sort(toks)
    // fold state: (prev token, current run, best run); "" is safe as
    // the initial prev — tokens are non-empty by construction
    val best = aggregate(
      sorted,
      struct(lit("").as("prev"), lit(0L).as("run"), lit(0L).as("best")),
      (acc, x) => {
        val run = when(x === acc.getField("prev"), acc.getField("run") + 1L)
          .otherwise(lit(1L))
        struct(x.as("prev"), run.as("run"),
          greatest(acc.getField("best"), run).as("best"))
      },
      acc => acc.getField("best"))
    df.select(
      col(idCol),
      size(toks).cast("long").as("n_tokens"),
      size(array_distinct(toks)).cast("long").as("n_distinct"),
      best.as("top_token_count"),
      (size(array_distinct(toks)).cast("double") /
        nullif(size(toks), lit(0))).as("distinct_ratio"),
      (best.cast("double") / nullif(size(toks), lit(0))).as("top_token_frac"))
  }

  /** N-GRAM repetition signals — the boilerplate/loop detector
    * [[repetitionStats]]'s token-level ratios cannot be: navigation
    * chrome, templated paragraphs, and degenerate generation loops
    * repeat PHRASES of ordinary tokens (each token individually
    * common, the token-level distinct ratio healthy), and only the
    * n-gram multiset exposes them. The Gopher-class quality filters
    * cut on exactly these two numbers per document: the duplicate
    * n-gram fraction (what share of the doc's n-grams are repeats of
    * an earlier one) and the top n-gram fraction (what share the
    * single most repeated phrase owns).
    *
    * Entirely MAP-SIDE, like [[repetitionStats]]: grams are a
    * sliding `concat_ws` over the token array, the distinct count is
    * `array_distinct`, and the max multiplicity is the sorted-array
    * run fold (equal grams adjacent → longest run = highest count) —
    * zero shuffles, the whole signal inside codegen, so at 100 TB
    * this is a free rider on any existing corpus scan. Fractions are
    * one double division of exact ints each (cross-engine
    * bit-identical). Documents with fewer than `n` tokens emit 0
    * grams and null fractions; NULL text stays NULL throughout (the
    * q61 null-symmetry discipline).
    *
    * Columns: `n_grams`, `n_distinct_grams`, `top_gram_count`,
    * `dup_gram_frac` = (n−distinct)/n, `top_gram_frac`. */
  def ngramRepetition(df: DataFrame, idCol: String, textCol: String,
      n: Int): DataFrame = {
    require(n >= 1, s"need n >= 1, got $n")
    val toks = tokens(col(textCol))
    val grams = when(toks.isNull, lit(null).cast("array<string>"))
      .when(size(toks) >= n,
        transform(sequence(lit(0), size(toks) - lit(n)),
          i => concat_ws(" ", slice(toks, i + lit(1), lit(n)))))
      .otherwise(array().cast("array<string>"))
    val sorted = array_sort(grams)
    val best = aggregate(
      sorted,
      struct(lit("").as("prev"), lit(0L).as("run"), lit(0L).as("best")),
      (acc, x) => {
        val run = when(x === acc.getField("prev"), acc.getField("run") + 1L)
          .otherwise(lit(1L))
        struct(x.as("prev"), run.as("run"),
          greatest(acc.getField("best"), run).as("best"))
      },
      acc => acc.getField("best"))
    df.select(
      col(idCol),
      size(grams).cast("long").as("n_grams"),
      size(array_distinct(grams)).cast("long").as("n_distinct_grams"),
      best.as("top_gram_count"),
      ((size(grams) - size(array_distinct(grams))).cast("double") /
        nullif(size(grams), lit(0))).as("dup_gram_frac"),
      (best.cast("double") / nullif(size(grams), lit(0))).as("top_gram_frac"))
  }

  /** Rolling-hash content fingerprint after normalization (lowercase,
    * strip non-alphanumerics-except-space, collapse whitespace) —
    * robust to case/punctuation edits, exact otherwise. */
  def fingerprint(textCol: Column): Column = {
    val normalized = regexp_replace(lower(textCol), "[^a-z0-9 ]", " ")
    rollingFingerprint(tokens(normalized))
  }

  /** Top-`k` characteristic keywords per document by tf·idf-style
    * weight. The score is the exact rational `tf * n_docs / df`
    * (linear inverse document frequency — no logarithm: a transcendental
    * would cost cross-engine bit-equality and changes only the scale,
    * not the per-document RANKING, of keywords). Ties break by token
    * text ascending, so the selection is fully deterministic.
    *
    * Scale design (100 TB):
    *  - term frequencies: one explode + groupBy(doc, token) with
    *    map-side partial aggregation;
    *  - document frequencies: a second aggregation over the tf frame
    *    (already one row per (doc, token) — no re-tokenization, and
    *    `count(*)` per token ≡ count-distinct docs);
    *  - the per-doc top-k rank filter plans as a map-side
    *    `WindowGroupLimit(Partial)` below the exchange, like every
    *    other top-k in this engine;
    *  - df lives in one broadcast-sized frame per distinct token. For
    *    web-scale vocabularies swap the broadcast for a shuffle join
    *    on token — the operator shape is unchanged.
    *
    * Returns (idCol, rank, token, tf, df, score). Docs with no tokens
    * emit no rows. */
  def topKeywords(df: DataFrame, idCol: String, textCol: String, k: Int): DataFrame = {
    require(k > 0, s"need k > 0, got $k")
    import org.apache.spark.sql.expressions.Window
    val tf = df
      .select(col(idCol), explode(tokens(col(textCol))).as("token"))
      .groupBy(col(idCol), col("token")).agg(count(lit(1)).as("tf"))
    val docFreq = tf.groupBy(col("token")).agg(count(lit(1)).as("df"))
    val nDocs = df.select(count(lit(1)).as("n_docs"))
    val scored = tf.join(broadcast(docFreq), "token").crossJoin(broadcast(nDocs))
      .withColumn("score",
        col("tf").cast("double") * col("n_docs") / col("df"))
    scored
      .withColumn("rank", row_number().over(
        Window.partitionBy(col(idCol))
          .orderBy(col("score").desc, col("token"))))
      .filter(col("rank") <= k)
      .select(col(idCol), col("rank").cast("long").as("rank"), col("token"),
        col("tf"), col("df"), col("score"))
  }
}
