package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators._

/** q220: CROSS-STORE ERASURE ([[graft.operators.Erasure]]) — one
  * "forget these ids everywhere" call fanned across every persisted
  * doc-derived store, then one purge window, then every store's
  * post-purge key/mass surface in a single frame the DuckDB oracle
  * recomputes FROM THE REMAINING CORPUS. The q189–q192 per-store
  * lifecycle gates pin each store's served VALUES after erasure;
  * this gate pins the COMPOSITION — one store skipped by the fan-out,
  * one store whose negated delta used different rows than the others
  * (the non-determinism hazard the shared pin exists for), or one
  * compaction that kept forgotten mass, and that store's row breaks.
  */
object ErasureQueries {

  private def dHash(x: String) =
    s"CAST('0x' || substr(md5($x), 1, 15) AS BIGINT)"
  private def dTokensOf(t: String) =
    s"list_filter(regexp_split_to_array(trim($t), '\\s+'), t -> t <> '')"

  /** The slice written into every store. */
  private val writtenF = "doc_id % 2 = 0"
  /** The forgotten sub-slice. */
  private val forgotF = "doc_id % 2 = 0 AND doc_id % 10 = 0"
  /** What the oracle replays everything from. */
  private val remainF = "doc_id % 2 = 0 AND doc_id % 10 <> 0"

  // ---------------------------------------------------------------
  // q220 — build 9 stores from the even-id corpus slice (one append
  // each; per-store append/serve ceremony is gated elsewhere), ONE
  // Erasure.forget of the %10 sub-slice (all stores, one pinned
  // erased frame, one batch id), ONE Erasure.purgeEverywhere, then
  // each store's physically-remaining key count and mass. The PQ
  // store erases by VECTOR id (the embeddings table), exercising the
  // vecIds leg of the fan-out.
  private def q220(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir).filter(expr(writtenF))
    val vecs = Tables.embeddings(s, dir).filter(col("vec_id") % 2 === 0)
    StoreGates.withTempStore(s, "graft_q220_all") { base =>
      def p(n: String) = new org.apache.hadoop.fs.Path(base, n).toString
      val stores = Seq[Erasure.StoreRef](
        Erasure.SignatureStore(p("sig")),
        Erasure.PostingStore(p("post")),
        Erasure.TokenIndexStore(p("ti")),
        Erasure.PqStore(p("pq")),
        Erasure.LmStore(p("lm")),
        Erasure.LangIdStore(p("lid"), "lang"),
        Erasure.LineDfStore(p("ldf"), "source"),
        Erasure.DsirTargetStore(p("dsir"), buckets = 64),
        Erasure.QualityStore(p("qual"), "lang", buckets = 64))

      // one append per store
      Dedup.writeSignatureStore(docs, "doc_id", "text", k = 8,
        shingleN = 3, root = p("sig"), batchId = 1L)
      InvertedIndex.writePostingStore(docs, "doc_id", "text", p("post"), 1L)
      LateInteraction.writeTokenIndex(docs, "doc_id", "text", dim = 8,
        p("ti"), batchId = 1L)
      val cb = Similarity.pqCodebook(
        Similarity.pqSeeds(vecs, "vec_id", centroids = 8),
        "vec_id", "embedding", dim = 64, m = 4)
        .localCheckpoint() // feeds the write; released before return
      Similarity.writePqIndex(vecs, cb, "vec_id", "embedding",
        dim = 64, m = 4, p("pq"), batchId = 1L)
      LanguageModel.writeLmStore(docs, "doc_id", "text", p("lm"), 1L)
      LanguageModel.writeLangIdStore(docs, "lang", "text", p("lid"), 1L)
      Boilerplate.writeLineDfStore(docs, "doc_id", "source", "text",
        p("ldf"), 1L)
      DataSelection.writeDsirTargetStore(docs, "doc_id", "text",
        buckets = 64, root = p("dsir"), batchId = 1L)
      QualityClassifier.writeQualityStore(docs, "lang", "text",
        buckets = 64, root = p("qual"), batchId = 1L)

      // the composed takedown: one call, every store
      Erasure.forget(docs.filter(col("doc_id") % 10 === 0),
        "doc_id", "text", stores, batchId = 2L,
        vecIds = Some((vecs.filter(col("vec_id") % 10 === 0), "vec_id")))
      Erasure.purgeEverywhere(s, stores, "doc_id", newBatchId = 3L,
        vecIdCol = "vec_id")
      Checkpoints.releasePinned(cb)

      // post-purge physical surface, one (store, metric, value) frame
      val sig = BatchStore.read(s, p("sig"))
      val post = BatchStore.read(s, p("post"))
      val stats = InvertedIndex.postingStoreStats(s, p("post"))
      val ti = BatchStore.read(s, p("ti"))
      val pq = BatchStore.read(s, p("pq"))
      val lm = BatchStore.read(s, p("lm"))
      val lid = BatchStore.read(s, p("lid"))
      val ldf = BatchStore.read(s, p("ldf"))
      val dsir = BatchStore.read(s, p("dsir"))
      val qual = BatchStore.read(s, p("qual"))
      def one(store: String, metric: String, df: DataFrame): DataFrame =
        df.select(lit(store).as("store"), lit(metric).as("metric"),
          col(df.columns.head).cast("long").as("value"))
      val out = Seq(
        one("signatures", "rows", sig.agg(count(lit(1)))),
        one("postings", "rows", post.agg(count(lit(1)))),
        one("postings", "tf_mass", post.agg(sum(col("tf")))),
        one("postings", "n_docs_stat", stats.select(col("n_docs"))),
        one("token_index", "passages",
          ti.agg(countDistinct(col("doc_id")))),
        one("pq", "vectors", pq.agg(countDistinct(col("vec_id")))),
        one("pq", "rows", pq.agg(count(lit(1)))),
        one("lm", "keys", lm.agg(count(lit(1)))),
        one("lm", "mass", lm.agg(sum(col("cnt")))),
        one("langid", "keys", lid.agg(count(lit(1)))),
        one("langid", "mass", lid.agg(sum(col("cnt")))),
        one("line_df", "keys", ldf.agg(count(lit(1)))),
        one("line_df", "mass", ldf.agg(sum(col("cnt")))),
        one("dsir_target", "keys", dsir.agg(count(lit(1)))),
        one("dsir_target", "mass", dsir.agg(sum(col("cnt")))),
        one("quality", "keys", qual.agg(count(lit(1)))),
        one("quality", "mass", qual.agg(sum(col("cnt")))))
        .reduce(_.unionByName(_))
        .orderBy(col("store"), col("metric"))
        .localCheckpoint() // owns the data; the temp stores delete now
      out
    }
  }

  private val q220Sql = {
    val toks = dTokensOf("text")
    s"""WITH rem AS (SELECT doc_id, text, lang, source FROM documents
      |  WHERE $remainF),
      |tok AS (SELECT doc_id, lang, source, $toks AS t FROM rem),
      |-- postings: one row per (doc, distinct token); tf mass = token count
      |ptok AS (SELECT doc_id, unnest(t) AS token FROM tok),
      |-- lm bigrams over remaining docs
      |bg AS (SELECT doc_id, t[i] AS w1, t[i+1] AS w2
      |  FROM tok, unnest(generate_series(1, len(t) - 1)) u(i)
      |  WHERE len(t) >= 2),
      |-- langid char trigrams over remaining docs
      |tri AS (SELECT lang, substr(text, CAST(i AS INTEGER), 3) AS tri
      |  FROM rem, unnest(generate_series(1, length(text) - 2)) u(i)
      |  WHERE length(text) >= 3),
      |-- line-df: distinct (source, line-hash) per doc
      |lines AS (SELECT DISTINCT doc_id, source, ${dHash("line")} AS lh
      |  FROM (SELECT doc_id, source, unnest(string_split(text, chr(10))) AS line
      |        FROM rem)),
      |-- hashed uni+bigram features (dsir buckets / quality (label, bucket))
      |grams AS (SELECT doc_id, lang, token AS g FROM
      |    (SELECT doc_id, lang, unnest(t) AS token FROM tok)
      |  UNION ALL
      |  SELECT doc_id, lang, t[i] || ' ' || t[i+1]
      |  FROM tok, unnest(generate_series(1, len(t) - 1)) u(i)
      |  WHERE len(t) >= 2),
      |feats AS (SELECT doc_id, lang, ${dHash("g")} % 64 AS bucket FROM grams),
      |remv AS (SELECT vec_id FROM embeddings
      |  WHERE vec_id % 2 = 0 AND vec_id % 10 <> 0),
      |-- posting-store stats sidecar: written minus erased raw doc counts
      |nstat AS (SELECT (SELECT COUNT(*) FROM documents WHERE $writtenF)
      |           - (SELECT COUNT(*) FROM documents WHERE $forgotF) AS n)
      |SELECT * FROM (
      |  SELECT 'signatures' AS store, 'rows' AS metric,
      |    CAST(COUNT(*) AS BIGINT) AS value FROM rem
      |  UNION ALL SELECT 'postings', 'rows',
      |    COUNT(*) FROM (SELECT DISTINCT doc_id, token FROM ptok)
      |  UNION ALL SELECT 'postings', 'tf_mass', COUNT(*) FROM ptok
      |  UNION ALL SELECT 'postings', 'n_docs_stat', n FROM nstat
      |  UNION ALL SELECT 'token_index', 'passages',
      |    COUNT(DISTINCT doc_id) FROM ptok
      |  UNION ALL SELECT 'pq', 'vectors', COUNT(*) FROM remv
      |  UNION ALL SELECT 'pq', 'rows', 4 * COUNT(*) FROM remv
      |  UNION ALL SELECT 'lm', 'keys',
      |    COUNT(*) FROM (SELECT DISTINCT w1, w2 FROM bg)
      |  UNION ALL SELECT 'lm', 'mass', COUNT(*) FROM bg
      |  UNION ALL SELECT 'langid', 'keys',
      |    COUNT(*) FROM (SELECT DISTINCT lang, tri FROM tri)
      |  UNION ALL SELECT 'langid', 'mass', COUNT(*) FROM tri
      |  UNION ALL SELECT 'line_df', 'keys',
      |    COUNT(*) FROM (SELECT DISTINCT source, lh FROM lines)
      |  UNION ALL SELECT 'line_df', 'mass', COUNT(*) FROM lines
      |  UNION ALL SELECT 'dsir_target', 'keys',
      |    COUNT(*) FROM (SELECT DISTINCT bucket FROM feats)
      |  UNION ALL SELECT 'dsir_target', 'mass', COUNT(*) FROM feats
      |  UNION ALL SELECT 'quality', 'keys',
      |    COUNT(*) FROM (SELECT DISTINCT lang, bucket FROM feats)
      |  UNION ALL SELECT 'quality', 'mass', COUNT(*) FROM feats)
      |ORDER BY store, metric""".stripMargin
  }

  val all: Seq[QueryDef] = Seq(
    QueryDef("q220_forget_everywhere", q220, Some(q220Sql)))
}
