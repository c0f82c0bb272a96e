package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import TextFunctions.tokens

/** Context-window chunking: split each document into fixed-token
  * windows with a stride (overlapping when stride < chunk), the
  * standard preprocessing for embedding models and long-document
  * training — a 100k-token doc becomes ~100k/stride rows, each within
  * the model's context budget.
  *
  * Scale design (100 TB): one map-side pass — tokenize, build the
  * window-start list with `sequence`, `slice` each window out,
  * `posexplode`. No shuffle, no state; output size is input tokens ×
  * (chunk/stride) overlap factor, and Spark's per-partition explode
  * streams rather than materializing all windows of a partition at
  * once. Pair with `spark.sql.files.maxPartitionBytes` tuned down for
  * giant-doc corpora so one partition's explosion fits in memory.
  */
object Chunking {

  /** One row per (doc, window): idCol, chunk_id (0-based), chunk_start
    * (0-based token offset), n_chunk_tokens, chunk_text (window tokens
    * re-joined with single spaces). Empty/whitespace-only docs emit no
    * rows. The final window may be shorter than `chunkTokens`; windows
    * start every `strideTokens` while any token remains.
    */
  def chunkByTokens(df: DataFrame, idCol: String, textCol: String,
      chunkTokens: Int, strideTokens: Int): DataFrame = {
    require(chunkTokens > 0, s"need chunkTokens > 0, got $chunkTokens")
    require(strideTokens > 0 && strideTokens <= chunkTokens,
      s"need 0 < strideTokens <= chunkTokens, got $strideTokens/$chunkTokens")
    val reserved = Seq("__toks", "__chunk", "chunk_id", "chunk_start",
      "n_chunk_tokens", "chunk_text")
    require(!reserved.contains(idCol) && !reserved.contains(textCol),
      s"idCol/textCol must not be one of ${reserved.mkString("/")}")
    // 1-based window starts: 1, 1+stride, ... while start <= n_tokens
    // (sequence(1, n) runs DESCENDING for n < 1 — guard empty docs)
    val starts = sequence(lit(1), size(col("__toks")), lit(strideTokens))
    val windows = transform(starts,
      start => slice(col("__toks"), start, lit(chunkTokens)))
    // adaptive parallelism floor (guide §2.5): the tokenize+window
    // chain is the expensive part and inherits the scan's task count —
    // one task on the single-row-group gate corpora (r19 profile); a
    // multi-row-group production scan makes this a no-op
    Parallelism.spread(df, idCol).select(col(idCol), tokens(col(textCol)).as("__toks"))
      .filter(size(col("__toks")) > 0)
      .select(col(idCol), posexplode(windows).as(Seq("chunk_id", "__chunk")))
      .select(
        col(idCol),
        col("chunk_id").cast("long").as("chunk_id"),
        (col("chunk_id").cast("long") * strideTokens).as("chunk_start"),
        size(col("__chunk")).cast("long").as("n_chunk_tokens"),
        array_join(col("__chunk"), " ").as("chunk_text"))
  }
}
