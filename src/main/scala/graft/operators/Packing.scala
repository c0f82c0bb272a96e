package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import TextFunctions.{hash60, tokenCount}

/** Sequence packing for training-data export: concatenate documents in
  * a deterministic order and chunk the stream into fixed token-budget
  * training sequences (the GPT-style "concat and chunk" packer — a doc
  * whose tokens cross a budget boundary straddles two sequences).
  *
  * Why concat-and-chunk and not first-fit bin packing: first-fit needs
  * sequential mutable state (the open bin's fill level), which does not
  * distribute; concat-and-chunk is a prefix sum — one window per shard
  * — and wastes zero budget (every sequence except a shard's last is
  * exactly full). That trade (splits instead of padding) is the one
  * production packers make at corpus scale.
  *
  * Scale notes (100 TB):
  *  - One shuffle on the shard key; the per-shard window is a sort, not
  *    a single-partition global order. Shard count scales with the
  *    corpus (shards ≈ corpus_tokens / target_shard_tokens), so each
  *    window partition stays bounded.
  *  - The order within a shard is hash-of-id (content-independent,
  *    reproducible across runs/engines/partitionings) — also the
  *    shuffle the training mix wants: consecutive docs in a sequence
  *    are unrelated, so no same-source runs leak into one context.
  */
object Packing {

  /** Assign each document a shard, a sequence id within the shard, and
    * its token offset inside that sequence. `straddles` marks docs that
    * cross a sequence boundary (split between two training sequences).
    *
    * Output columns: idCol, shard, n_tokens, seq_id, seq_offset,
    * straddles. Deterministic: order within a shard is
    * (hash60(id), id); id must be unique.
    */
  def packSequences(df: DataFrame, idCol: String, textCol: String,
      shards: Int, budgetTokens: Long): DataFrame = {
    require(shards > 0, s"need shards > 0, got $shards")
    require(budgetTokens > 0, s"need budgetTokens > 0, got $budgetTokens")
    // Internal AND output names: idCol="seq_id" would otherwise emit
    // two seq_id columns silently.
    val reserved = Seq("__graft_id", "shard", "n_tokens", "cum_before",
      "seq_id", "seq_offset", "straddles")
    require(!reserved.contains(idCol) && !reserved.contains(textCol),
      s"idCol/textCol must not be one of ${reserved.mkString("/")}")
    val idStr = col(idCol).cast("string")
    val w = Window.partitionBy(col("shard"))
      .orderBy(hash60(col("__graft_id")), col("__graft_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    df.select(
        col(idCol), idStr.as("__graft_id"),
        tokenCount(col(textCol)).cast("long").as("n_tokens"))
      .withColumn("shard", pmod(hash60(col("__graft_id")), lit(shards.toLong)))
      .withColumn("cum_before", coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      .select(
        col(idCol), col("shard"), col("n_tokens"),
        expr(s"cum_before DIV $budgetTokens").as("seq_id"),
        (col("cum_before") % budgetTokens).as("seq_offset"),
        (col("n_tokens") > 0 &&
          expr(s"(cum_before + n_tokens - 1) DIV $budgetTokens") >
            expr(s"cum_before DIV $budgetTokens")).as("straddles"))
  }
}
