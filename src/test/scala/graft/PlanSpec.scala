package graft

import org.scalatest.funsuite.AnyFunSuite

/** Plan-quality regression tests: the physical plans these queries are
  * DESIGNED to produce (SURVEY.md §4, README "100 TB design notes").
  * A passing result here is the difference between "returns the right
  * rows" and "would still be fast at 1000× the data".
  */
class PlanSpec extends AnyFunSuite {
  lazy val spark = Sessions.local(4)
  private val sf = "/root/testdata/sf0.01"

  private def planOf(name: String): String =
    SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan.toString

  /** Final adaptive plan in formatted mode — codegen spans only appear
    * once AQE has finalized, so execute first. */
  private def finalPlanOf(name: String): String = {
    val df = SparkEntry.queries(name)(spark, sf)
    df.collect() // finalize THIS plan under AQE (count() would build its own)
    df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
  }

  test("q07: the event-type filter is pushed into the parquet scan") {
    val p = planOf("q07_filtered_avg")
    assert(p.contains("PushedFilters: [IsNotNull(event_type), EqualTo(event_type,purchase)]"), p)
  }

  test("q07: scan reads only the two needed columns (pruning)") {
    val p = planOf("q07_filtered_avg")
    assert(p.contains("ReadSchema: struct<event_type:string,value:double>"), p)
  }

  test("q09: top-k plans as TakeOrderedAndProject, not a global sort") {
    val p = planOf("q09_top20_ltv")
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("q13: anti join is a broadcast hash join (no shuffle of customers)") {
    val p = planOf("q13_anti_join")
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftAnti"), p)
  }

  test("q01: aggregation runs inside whole-stage codegen") {
    val p = finalPlanOf("q01_global_agg")
    // formatted mode marks codegen'd operators with '*' and tags them
    // with a codegen id in the detail section
    assert(p.contains("* HashAggregate"), p)
    assert(p.contains("[codegen id :"), p)
  }

  /** The scored corpus×queries product must never fully shuffle into
    * |queries| reducers: Catalyst's InferWindowGroupLimit has to plan a
    * map-side WindowGroupLimit(Partial) below the exchange so each
    * corpus partition forwards at most k rows per query. */
  private def assertPartialGroupLimit(name: String): Unit = {
    val lines = planOf(name).linesIterator.toSeq
    val partial = lines.indexWhere(l =>
      l.contains("WindowGroupLimit") && l.contains("Partial"))
    val finalGl = lines.indexWhere(l =>
      l.contains("WindowGroupLimit") && l.contains("Final"))
    assert(partial >= 0 && finalGl >= 0, lines.mkString("\n"))
    // tree prints top-down: the Partial node is deeper (below the
    // exchange), so it must appear AFTER the Final node
    assert(partial > finalGl, lines.mkString("\n"))
  }

  test("q34: ANN top-k rank is a map-side partial group-limit, not a full shuffle") {
    assertPartialGroupLimit("q34_ann_brute_force")
  }

  test("q35: bucketed ANN rank is a map-side partial group-limit too") {
    assertPartialGroupLimit("q35_ann_bucketed")
  }

  test("q135: int8 ANN keeps the map-side partial group-limit of the float path") {
    assertPartialGroupLimit("q135_int8_topk")
  }

  test("q138: index stats ride the posting window's exchange — two corpus shuffles") {
    val p = planOf("q138_inverted_index")
    // (token, doc) tf aggregate + the token window; the final token
    // aggregate must REUSE the window's hashpartitioning instead of
    // adding a third corpus exchange
    assert("Exchange hashpartitioning".r.findAllIn(p).length == 2, p)
  }

  test("q139: AND search top-k is TakeOrderedAndProject, not a global sort") {
    val p = planOf("q139_term_search")
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("q151: idf-ranked search keeps the TakeOrderedAndProject top-k; corpus never cartesians") {
    val p = planOf("q151_ranked_search")
    assert(p.contains("TakeOrderedAndProject"), p)
    // df / n_docs are 1-row broadcast scalars (BNLJ is their intended
    // join shape); the corpus side must never product with itself
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q153: BM25 keeps q151's top-k shape; the (N, Σdl) stats row broadcasts") {
    val p = planOf("q153_bm25_search")
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      s"the 1-row corpus-stats side must broadcast:\n$p")
  }

  test("q154: n-gram repetition is entirely map-side — zero exchanges before the sort") {
    // one Exchange is legal: the final orderBy. Nothing else may
    // shuffle — grams, distinct counts, and the run fold are all
    // array expressions inside the scan's projection.
    val p = planOf("q154_ngram_repetition")
    val exchanges = "(?<!Reused)Exchange".r.findAllIn(p).size
    assert(exchanges <= 1, s"expected at most the orderBy exchange, got $exchanges:\n$p")
    assert(!p.contains("HashAggregate"), s"per-doc signals must not aggregate:\n$p")
  }

  test("q158: segmentation joins the trained vocab — no cartesian, no per-occurrence re-segmentation") {
    val p = planOf("q158_bpe_segment")
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin") ||
      p.contains("BroadcastHashJoin"), s"word equi-join expected:\n$p")
  }

  test("q160: passage retrieval broadcasts the queries and ranks with a map-side group limit") {
    val p = planOf("q160_passage_retrieval")
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("BroadcastNestedLoopJoin"),
      s"the eval-query side must broadcast:\n$p")
    assert(p.contains("WindowGroupLimit"),
      s"per-query top-5 must plan as WindowGroupLimit:\n$p")
  }

  test("q155: containment candidates come from the band join — never all pairs") {
    val p = planOf("q155_containment")
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin") ||
      p.contains("BroadcastHashJoin"), s"band equi-join expected:\n$p")
  }

  test("q144: phrase search is scan → filter → TakeOrderedAndProject — zero exchanges") {
    val p = planOf("q144_phrase_search")
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(!p.contains("Exchange"), p)
  }

  test("q141: the pairwise matrix never re-scans the corpus; the sketch is rank-limited map-side") {
    // final plan: everything past the localCheckpoint barrier is
    // sketch-sized — a parquet scan here means a consumer re-derived
    // the corpus-wide sketch (measured 3 scans before the barrier)
    val p = planOf("q141_source_overlap")
    assert(!p.contains("Scan parquet"), p)
    // the sketch subplan itself: distinct + two bounded windows = 3
    // corpus exchanges, each row_number filter pushed into a
    // WindowGroupLimit (partial rank before the full sort)
    import org.apache.spark.sql.functions._
    import graft.operators.{Sketches, TextFunctions}
    val grams = Tables.documents(spark, sf).select(col("source"),
      explode(TextFunctions.hashedShingles(
        TextFunctions.tokens(col("text")), 3)).as("h"))
    val sp = Sketches.kMinValues(grams, "source", "h", k = 64)
      .queryExecution.executedPlan.toString
    assert("Exchange hashpartitioning".r.findAllIn(sp).length == 3, sp)
    assert(sp.contains("WindowGroupLimit"), sp)
  }

  test("q29: exact dedup is one pass — a single scan and a single md5") {
    val p = planOf("q29_dedup_exact")
    // the groupBy-then-rejoin shape scanned documents twice and hashed
    // the corpus twice; the window rewrite must show exactly one scan
    assert("Scan parquet".r.findAllIn(p).length == 1, p)
    assert("md5".r.findAllIn(p).length == 1, p)
  }

  test("q48: hash sample is a map-side filter — no exchange at all") {
    val p = planOf("q48_hash_sample")
    assert(!p.contains("Exchange"), p)
  }

  test("q49: per-group cap is a map-side partial group-limit") {
    val lines = planOf("q49_cap_per_group").linesIterator.toSeq
    val partial = lines.indexWhere(l =>
      l.contains("WindowGroupLimit") && l.contains("Partial"))
    assert(partial >= 0, lines.mkString("\n"))
  }

  test("q51: IVF assignment is map-side — the corpus hash-shuffles once") {
    val p = planOf("q51_ivf_assign")
    // exactly one hash exchange (the groupBy over 8 assigned buckets);
    // the argmax fold itself must not shuffle or window the corpus.
    // (The remaining exchanges are 8-row: centroid collect_list's
    // SinglePartition, its broadcast, and the orderBy's range.)
    assert("Exchange hashpartitioning".r.findAllIn(p).length == 1, p)
    assert(!p.contains("Window"), p)
  }

  test("q52: IVF multi-probe rank keeps the partial group-limit shape") {
    assertPartialGroupLimit("q52_ivf_multiprobe")
  }

  test("q58: salted count-distinct is two-phase — the wide shuffle keys on the value") {
    val p = planOf("q58_salted_distinct")
    val exchanges = p.linesIterator.filter(_.contains("Exchange hashpartitioning")).toSeq
    // phase 1 (the only shuffle proportional to |rows|) must include
    // the distinct value in its partition key — uniform by construction,
    // no reducer ever owns one event_type's whole value domain
    assert(exchanges.exists(_.contains("__graft_v")), p)
    // phase 2 merges per-salt partials: a second, tiny hash exchange
    assert(exchanges.length >= 2, p)
  }

  test("q55: retention cohorts read orders exactly once") {
    val p = planOf("q55_set_ops")
    // the naive intersect/except formulation scanned orders four times;
    // the presence-flag rewrite must show a single date-pruned scan
    assert("Scan parquet".r.findAllIn(p).length == 1, p)
  }

  test("q60: decontamination probes the corpus with a broadcast semi join") {
    val p = planOf("q60_decontaminate")
    // eval gram set broadcasts; the training corpus must NOT shuffle
    // into the contamination join
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftSemi"), p)
  }

  test("q64: packing windows on the shard key — never a single-partition sort") {
    val p = planOf("q64_sequence_packing")
    // the prefix sum must run per shard (hash exchange on the shard
    // column); a SinglePartition window would serialize the corpus
    assert(p.contains("Exchange hashpartitioning(shard"), p)
    assert(!p.contains("Exchange SinglePartition"), p)
  }

  test("q66: PII scrubbing is pure map-side — no hash exchange, one scan") {
    val p = planOf("q66_pii_redaction")
    // four redaction rules + four counts must stay one fused projection
    // over one corpus scan (the only exchange is the output orderBy)
    assert(!p.contains("Exchange hashpartitioning"), p)
    assert("Scan parquet".r.findAllIn(p).length == 1, p)
  }

  test("q67: k-means step shuffles once — the (cluster, dim) partial agg") {
    val p = planOf("q67_kmeans_step")
    // assignment is the q51 zero-shuffle broadcast argmax; the update
    // step's mean is a mergeable partial aggregate, so exactly one
    // corpus-proportional hash exchange and no Window anywhere
    assert("Exchange hashpartitioning".r.findAllIn(p).length == 1, p)
    assert(!p.contains("Window"), p)
    // map-side combine before that exchange
    assert(p.contains("HashAggregate"), p)
  }

  test("q68: chunking adds no REQUIRED hash exchange — explode stays " +
      "map-side above the adaptive spread") {
    val p = planOf("q68_chunking")
    // r19: Chunking.chunkByTokens may open with ONE deliberate
    // Parallelism.spread exchange (REPARTITION_BY_NUM — the §2.5
    // parallelism floor over single-row-group inputs; a no-op on
    // parallel scans). The pin's intent is unchanged: the chunking
    // computation itself must not demand a shuffle — no
    // ENSURE_REQUIREMENTS hash exchange anywhere in the plan (the
    // final orderBy's RANGE exchange is the gate's own sort, not
    // chunking's).
    assert("hashpartitioning[^\\n]*ENSURE_REQUIREMENTS".r
      .findFirstIn(p).isEmpty, p)
    assert(p.contains("Generate"), p) // the posexplode
  }

  test("q69: per-doc keyword top-k keeps the partial group-limit shape") {
    assertPartialGroupLimit("q69_keywords")
  }

  test("q65: percentile bounds broadcast back — the corpus side never shuffles to join") {
    val p = planOf("q65_length_trim")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("q70: stratified quotas broadcast back — no corpus-side merge join") {
    val p = planOf("q70_stratified_sample")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("q72: BPE pair top-k is TakeOrdered over a partial aggregation") {
    val p = planOf("q72_bpe_pairs")
    // pair counts combine map-side; the top-20 is a per-partition heap
    // merge, never a global sort of the pair domain
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(p.contains("partial_count") || p.contains("HashAggregate"), p)
    assert(!p.contains("Exchange rangepartitioning"), p)
  }

  test("q73: the vocabulary broadcasts back — the corpus never shuffles to join it") {
    val p = planOf("q73_vocab_coverage")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("q77: SQL-injected native kernels stay map-side — no hash exchange, one scan") {
    val p = planOf("q77_sql_native_fns")
    assert(!p.contains("Exchange hashpartitioning"), p)
    assert("Scan parquet".r.findAllIn(p).length == 1, p)
    // the injected functions resolved to the native expressions
    assert(p.contains("hash60") && p.contains("dot_f64"), p)
  }

  test("q78: the Morton interleave aggregates partially below one exchange") {
    val p = planOf("q78_zorder_buckets")
    assert("Exchange hashpartitioning".r.findAllIn(p).length == 1, p)
    assert(p.contains("partial_count") || p.contains("HashAggregate"), p)
  }

  test("q81: the bloom prefilter sits below the semi join") {
    val p = planOf("q81_bloom_semi_join")
    assert(p.contains("LeftSemi"), p)
    // the mightContain probe is a plain Filter on the big side, not a
    // post-join residual
    val filterIdx = p.indexOf("UDF")
    val joinIdx = p.indexOf("Join")
    assert(filterIdx > 0 && joinIdx > 0 && filterIdx > joinIdx, p)
  }

  test("q02: grouped aggregation is partial (map-side combine before shuffle)") {
    val df = SparkEntry.queries("q02_groupby_agg")(spark, sf)
    val p = df.queryExecution.executedPlan.toString
    // partial_sum markers appear below the exchange → map-side combine
    assert(p.contains("partial_sum"), p)
  }

  test("q82: the salted join is a ShuffledHashJoin on (key, salt) with the dim exploded") {
    val p = planOf("q82_salted_join")
    // hint honored: never a broadcast (that would make the salt moot)
    // and never a sort-merge (that would re-sort the exploded dim)
    assert(p.contains("ShuffledHashJoin"), p)
    assert(!p.contains("BroadcastHashJoin"), p)
    assert(p.contains("__graft_salt"), p)
    assert(p.contains("Generate"), p) // the dim-side explode
  }

  test("q84: gap fill scans the corpus once — grid/span/join read the materialized counts") {
    val df = SparkEntry.queries("q84_gap_fill")(spark, sf)
    val p = df.queryExecution.executedPlan.toString
    // the checkpoint barrier replaces all corpus subtrees: the final
    // plan reads the (days × dims) LocalCheckpoint, never the parquet
    assert(!p.contains("events.parquet"), p)
  }

  test("q87: CUBE expands in one pass — a single Expand, no per-grouping-set rescan") {
    val p = planOf("q87_cube")
    assert("Expand".r.findAllIn(p).length == 1, p)
    assert("Scan parquet".r.findAllIn(p).length == 1, p)
  }

  test("q88: weighted sampling stays a corpus-side filter under a broadcast 1-row max") {
    val p = planOf("q88_weighted_sample")
    // the corpus side never hash-shuffles: the only exchanges are the
    // 1-row max aggregation's and its broadcast
    assert(!p.contains("hashpartitioning"), p)
    assert(p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("q91: RP-LSH candidates come from the bucket join — never all pairs") {
    val p = planOf("q91_rp_lsh_neardup")
    // the pair generator is an equi join on (rp_table, rp_bucket);
    // a cartesian/BNLJ product here is the all-pairs blowup LSH exists
    // to avoid
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.contains("rp_bucket"), p)
  }

  test("q193 serving chain: LSH candidates + embedding join-back — no corpus product anywhere") {
    // the SERVING form of rpLshMmrTopK (meanRecallFloor = 0): pin the
    // pre-checkpoint stages — the candidate build is the q172 bucket
    // join, and MMR's embedding join-back is candidate-KEYED (equi
    // join on neighbor_id), so no cartesian/BNLJ may appear even
    // though the brute gate variant legitimately uses one. Pinned on
    // the pre-checkpoint frame (the composed operator's result is a
    // checkpoint scan, round-10 gotcha).
    import org.apache.spark.sql.functions._
    import graft.operators.Similarity
    val docs = Tables.documents(spark, sf)
    val corpus = docs.filter(col("doc_id") % 97 =!= 3)
      .select(col("doc_id").as("nid"),
        graft.operators.TextFunctions.hashEmbed(col("text"), 32).as("emb"))
    val queries = docs.filter(col("doc_id") % 97 === 3)
      .select(col("doc_id").as("nid"),
        graft.operators.TextFunctions.hashEmbed(col("text"), 32).as("emb"))
    val cands = Similarity.rpLshTopK(corpus, queries, "nid", "emb",
      dim = 32, bits = 12, tables = 8, k = 10)
    val withVec = cands.join(
        corpus.select(col("nid").as("neighbor_id"), col("emb").as("__emb")),
        Seq("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        col("cosine").as("rel"), col("__emb"))
    val p = withVec.queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.contains("rp_bucket"), p)
  }

  test("q131: embed→LSH near-dup — candidates from the bucket join, no corpus product") {
    val p = planOf("q131_embed_lsh_neardup")
    // same contract as q91, now with the encoder feeding the LSH: the
    // pair generator is an equi join on (rp_table, rp_bucket) — a
    // cartesian/BNLJ anywhere means the corpus product q130 is pinned
    // to has leaked into the scale path
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.contains("rp_bucket"), p)
  }

  test("q92: the trailing window is a RANGE frame over one window shuffle") {
    val p = planOf("q92_trailing_window")
    assert(p.contains("RangeFrame"), p)
    assert("Window \\[".r.findAllIn(p).length == 1, p)
    assert("Scan parquet".r.findAllIn(p).length == 1, p)
  }

  test("q93: trend sums aggregate partially map-side; no window anywhere") {
    val p = planOf("q93_trend_slope")
    assert(p.contains("partial_sum"), p)
    assert(!p.contains("Window"), p)
  }

  test("q94: the partials-then-merge rollup still scans the corpus once") {
    val p = planOf("q94_incremental_rollup")
    assert(p.contains("partial_sum"), p)
    assert("Scan parquet".r.findAllIn(p).length == 1, p)
  }

  test("q95: quantile binning is a fold under a broadcast bounds row — no range join") {
    val p = planOf("q95_quantile_bins")
    assert(p.contains("BroadcastNestedLoopJoin"), p) // the 1-row bounds
    assert(p.contains("partial_sum"), p)             // map-side bin combine
  }

  test("q96: the aggregate argmax plans with NO window — partial max(struct)") {
    val p = planOf("q96_argmax_agg")
    assert(!p.contains("Window"), p)
    assert(p.contains("partial_max"), p)
  }

  test("q97: frame sampling is map-side — metadata filter, explode, no hash exchange") {
    val p = planOf("q97_frame_sample")
    assert(!p.contains("hashpartitioning"), p)
    assert(p.contains("Generate"), p) // the per-video index explode
    assert("Scan parquet".r.findAllIn(p).length == 1, p)
  }

  test("q98: GROUPING SETS expands once — a single Expand, one scan") {
    val p = planOf("q98_grouping_sets")
    assert("Expand".r.findAllIn(p).length == 1, p)
    assert("Scan parquet".r.findAllIn(p).length == 1, p)
  }

  test("q99: ratio-to-report windows the post-aggregation frame over broadcast star joins") {
    val p = planOf("q99_ratio_to_report")
    assert("BroadcastHashJoin".r.findAllIn(p).length == 3, p)
    assert(p.contains("partial_sum"), p)
    assert("Window \\[".r.findAllIn(p).length == 1, p)
  }

  test("q107: the co-located join never shuffles on the join key") {
    // at gate scale the optimizer would (correctly) broadcast the
    // small side; disable broadcast to see the shape the bucketing
    // exists for — two FACT-scale sides joined bucket-to-bucket
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevA = spark.conf.getOption("spark.sql.adaptive.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      val p = planOf("q107_bucketed_join")
      assert(p.contains("SortMergeJoin"), p)
      assert(p.contains("Bucketed: true"), p)
      // no exchange keyed on the join key anywhere — the only
      // exchanges are the 5-group aggregate's and the final sort's
      assert(!p.contains("hashpartitioning(o_orderkey"), p)
      assert("Exchange".r.findAllIn(p).length == 2, p)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      prevA.fold(spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold"))(
        spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", _))
    }
  }

  test("q103: correlated subqueries decorrelate — anti join + agg-join, no per-row re-execution") {
    val p = planOf("q103_correlated_subqueries")
    assert(p.contains("LeftAnti"), p)          // NOT EXISTS → anti join
    assert(p.contains("partial_sum"), p)       // scalar subquery → aggregate
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q102: the typed Aggregator aggregates partially; signatures pair, documents never do") {
    val p = planOf("q102_group_signature")
    // the UDAF plans as ObjectHashAggregate with a map-side partial
    assert(p.contains("ObjectHashAggregate"), p)
    assert(p.toLowerCase.contains("partial_signaturemin"), p)
    // the only non-equi join is the |groups|-row signature pairing —
    // a doc×doc product would surface as a cartesian/BNLJ over the
    // corpus-sized frames
    assert(!p.contains("CartesianProduct"), p)
    val bnljs = "BroadcastNestedLoopJoin".r.findAllIn(p).length
    // signature pairing (ga < gb) is the one legitimate BNLJ: both
    // sides are the |groups|-row aggregate, never the documents
    assert(bnljs <= 1, p)
  }

  // q109's executed top-level plan is the re-key's checkpointed RDD
  // (lineage truncated), so the semi-join prune can't be pinned from
  // the final plan string — its EFFECT is pinned measurably instead:
  // MetricsSpec's "SCD2 changedOnly shuffles batch-proportional bytes"
  // asserts the diff join's dimension-sized exchanges disappear.

  test("q110: recall gate joins broadcast-sized rank frames — no corpus product") {
    val p = planOf("q110_ivf_recall")
    // brute force + IVF candidate scoring each broadcast the tiny
    // query/centroid side; the corpus appears only under broadcast
    // joins and partial group-limits, never in a cartesian product
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.contains("WindowGroupLimit"), p)  // top-k stays partial group-limit
  }

  test("q121: substring dedup is shuffle-linear — no pair product, partial-agg gram count") {
    val p = planOf("q121_substring_dedup")
    // the duplicated-gram set must come from a partial-aggregated
    // groupBy on the gram hash, and positions join it on that same
    // hash — never any document-pair product
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("partial_count(distinct"), p) // map-side combine on gh
    assert(p.contains("Generate posexplode"), p)    // corpus-linear gram explode
  }

  test("q123: semantic dedup pairs only within clusters — a keyed join, no corpus product") {
    val p = planOf("q123_semantic_dedup")
    // the only nested-loop joins are the broadcast single-row centroid
    // arrays (ivfAssign); the pair stage must key on centroid_id
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin")
      || p.contains("BroadcastHashJoin"), p)
    assert(p.contains("centroid_id"), p)
  }

  test("q95: ONE exact-percentile aggregate computes every boundary (array form)") {
    val p = planOf("q95_quantile_bins")
    // nine separate percentile aggs would buffer the column nine times;
    // the array form appears exactly once in the aggregate expressions
    val hits = "percentile\\(".r.findAllIn(p).length
    assert(hits <= 4, s"expected one percentile agg (partial+final ≤4 mentions), got $hits\n$p")
  }

  test("q230: hashed retrieval broadcasts the query features; rank is a map-side partial group-limit") {
    val p = planOf("q230_hashed_retrieval")
    // the sparse-dot bucket join must build on the (small) query side —
    // a sort-merge join here would shuffle the corpus features per query
    // set; the top-k must keep the map-side partial shape
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"), p)
    assertPartialGroupLimit("q230_hashed_retrieval")
  }

  test("q225: prototype pruning assigns map-side — one corpus hash-shuffle for the in-cluster rank") {
    val p = planOf("q225_prototype_prune")
    // ivfAssign's argmax is the broadcast array_min fold (no join, no
    // window); the ONLY corpus hash exchange is the centroid_id rank's.
    // (Remaining exchanges: the 8-row centroid collect, its broadcast,
    // and the orderBy's range partitioning.)
    assert("Exchange hashpartitioning".r.findAllIn(p).length == 1, p)
    assert(!p.contains("CartesianProduct"), p)
  }
}
