package graft

import org.apache.spark.sql.functions._

/** SCALE.md driver for the q172 serving path: times the LSH-fronted
  * candidate build + verify ([[graft.operators.Similarity.rpLshTopK]])
  * against the exact brute-force build over the SAME chunk corpus and
  * eval queries, at each directory argument — the measured contrast
  * behind the claim that the RAG candidate build stops growing as
  * corpus×queries once the LSH front end is wired in (the brute build
  * measured 8.0× at 10× data with both sides growing — SCALE.md, the
  * q164 row).
  *
  * `runMain graft.PassageLshProbe <queryMod> <dir1> [dir2 ...]`
  * prints one `LSHSERVE <dir> mod=<m> <path> <median>s [runs]` line
  * per (dir, path), with the [[Bench.isolate]] start-line
  * discipline. `queryMod` sets the eval-set size (queries = docs
  * with doc_id % mod == 3; q172's gate uses 97): the brute product
  * costs chunks×queries while LSH signing costs chunks×(tables·bits)
  * — the crossover sits near queries ≈ tables·bits, so probe both a
  * gate-sized (97) and a serving-sized (7) eval set.
  */
object PassageLshProbe {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: PassageLshProbe <queryMod> <dir1> [dir2 ...]")
    val qMod = args(0).toInt
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt)
    import graft.operators.{Chunking, Similarity, TextFunctions}
    args.drop(1).toSeq.foreach { dir =>
      def nrm(c: org.apache.spark.sql.Column) =
        sqrt(aggregate(transform(c, x => x * x), lit(0.0), (a, v) => a + v))
      // mirrors q172's chunkQueryEmb: the chunk embedding frame is
      // localCheckpoint'd (the encoder feeds norms, 96 signature
      // dots, and every candidate cosine — the CollapseProject
      // barrier); queries are eval-set-sized and stay inline
      def build() = {
        val docs = Tables.documents(spark, dir)
        val chunks = Chunking.chunkByTokens(docs.filter(col("doc_id") % qMod =!= 3),
            "doc_id", "text", chunkTokens = 64, strideTokens = 48)
          .select((col("doc_id") * lit(1048576L) + col("chunk_id")).as("nid"),
            TextFunctions.hashEmbed(col("chunk_text"), 32).as("emb"))
          .withColumn("n", nrm(col("emb"))).filter(col("n") > 0)
          .drop("n")
          .localCheckpoint()
        val queries = docs.filter(col("doc_id") % qMod === 3)
          .select(col("doc_id").as("nid"),
            TextFunctions.hashEmbed(col("text"), 32).as("emb"))
          .withColumn("n", nrm(col("emb"))).filter(col("n") > 0)
          .drop("n")
        (chunks, queries)
      }
      def time(label: String)(f: => Long): Unit = {
        def run(): Double = {
          Bench.isolate(spark)
          val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
        }
        run() // warmup
        val ts = (1 to 3).map(_ => run()).sorted
        println(f"LSHSERVE $dir mod=$qMod $label ${ts(1)}%.3f s  " +
          ts.map(t => f"$t%.3f").mkString("[", ",", "]"))
      }
      time("lsh") {
        val (c, q) = build()
        Similarity.rpLshTopK(c, q, "nid", "emb", dim = 32, bits = 12,
          tables = 8, k = 5).count()
      }
      time("brute") {
        val (c, q) = build()
        Similarity.bruteForceTopK(c, q, "nid", "emb", k = 5).count()
      }
      // the full SERVING chain (q193 without its eval-only brute
      // gate): LSH top-10 candidates → MMR 5-deep diversity re-rank —
      // the number a production retriever actually pays per batch of
      // queries
      time("lsh+mmr") {
        val (c, q) = build()
        val sel = Similarity.rpLshMmrTopK(c, q, "nid", "emb", dim = 32,
          bits = 12, tables = 8, topN = 10, k = 5)
        val n = sel.count()
        graft.operators.Checkpoints.releasePinned(sel)
        n
      }
      // the brute-fronted equivalent (q164's shape) for the contrast
      time("brute+mmr") {
        val (c, q) = build()
        val cands = Similarity.bruteForceTopK(c, q, "nid", "emb", k = 10)
          .join(c.select(col("nid").as("neighbor_id"), col("emb").as("__emb")),
            Seq("neighbor_id"))
          .select(col("query_id"), col("neighbor_id"),
            col("cosine").as("rel"), col("__emb"))
        val sel = Similarity.mmrRerank(cands, "query_id", "neighbor_id",
          "rel", "__emb", k = 5)
        val n = sel.count()
        graft.operators.Checkpoints.releasePinned(sel)
        n
      }
      // the PRECISION serving chain (q197's shape): LSH top-10
      // candidates → token-level MaxSim re-scoring — what the
      // two-stage retriever pays when the back end is
      // late-interaction instead of MMR diversity
      time("lsh+maxsim") {
        val docs = Tables.documents(spark, dir)
        val (c, q) = build()
        val cands = Similarity.rpLshTopK(c, q, "nid", "emb", dim = 32,
            bits = 12, tables = 8, k = 10)
          .select(col("query_id"), col("neighbor_id"))
        val passages = Chunking.chunkByTokens(
            docs.filter(col("doc_id") % qMod =!= 3),
            "doc_id", "text", chunkTokens = 64, strideTokens = 48)
          .select((col("doc_id") * lit(1048576L) + col("chunk_id"))
            .as("neighbor_id"), col("chunk_text").as("text"))
        val qtext = docs.filter(col("doc_id") % qMod === 3)
          .select(col("doc_id").as("query_id"), col("text"))
        val sel = graft.operators.LateInteraction.maxSimRerank(
          cands, qtext, passages, "query_id", "neighbor_id", "text",
          dim = 16, maxQueryTokens = 16, k = 5)
        val n = sel.count()
        graft.operators.Checkpoints.releasePinned(sel)
        n
      }
    }
    spark.stop()
  }
}
