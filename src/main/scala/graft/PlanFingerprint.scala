package graft

import org.apache.spark.sql.DataFrame

/** Normalized physical-plan digest per gated query — the
  * machine-checked "no plan change" signal the bench artifact carries.
  * The box's same-code run-to-run timing breathes 0.98–1.10× with
  * single-query spikes to 3×, which exceeds the movement a real plan
  * regression produces on sub-second gates — so round-over-round
  * triage needs a signal that is NOISE-FREE: the physical plan string,
  * normalized (expression ids, temp paths, UUIDs, RDD ids stripped)
  * and hashed. A mover whose plan hash is unchanged is load/GC noise
  * by construction; a changed hash names exactly the queries whose
  * shape moved and must be explained in the round notes.
  *
  * Scope, honestly: queries whose gate ends in `localCheckpoint()`
  * (the temp-store lifecycle gates) hash a `Scan ExistingRDD` tail —
  * their internal store plans are pinned by PlanSpec/MetricsSpec
  * instead, and this digest still catches changes in everything
  * around the checkpoint. The digest is computed pre-execution
  * (AQE's initial plan): deterministic for fixed code + testdata. */
object PlanFingerprint {

  private[graft] def normalize(plan: String): String = plan
    // expression ids and plan ids differ per session, not per shape
    .replaceAll("#\\d+[L]?", "#")
    .replaceAll("plan_id=\\d+", "plan_id=")
    .replaceAll("exprId=\\d+", "exprId=")
    // cached/checkpointed RDD ids and names
    .replaceAll("RDD\\[\\d+\\]", "RDD[]")
    .replaceAll("rdd_\\d+_\\d+", "rdd_")
    // temp dirs, store roots, scheme'd paths, UUID dir components
    .replaceAll(
      "[0-9a-fA-F]{8}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-" +
        "[0-9a-fA-F]{12}", "<uuid>")
    .replaceAll("(file|hdfs|s3a?)://?[^\\s,\\)\\]]*", "<path>")
    .replaceAll("/tmp/[^\\s,\\)\\]]*", "<path>")
    .replaceAll("Location: \\S+ \\[[^\\]]*\\]", "Location: <loc>")
    .replaceAll("\\d+ paths", "<n> paths")
    // typed-Dataset closures render as Class$$Lambda$1234/0x00007f...@abcd;
    // both the lambda index and the hex addresses are JVM-assigned —
    // stable within one JVM but not across runs. Strip them so plans
    // containing MapElements/SerializeFromObject hash deterministically.
    .replaceAll("\\$\\$Lambda(\\$\\d+)?(/0x[0-9a-fA-F]+)?", "\\$\\$Lambda")
    .replaceAll("@[0-9a-fA-F]{4,}", "@")
    // higher-order-function lambda variables (transform/aggregate/
    // zip_with) are freshly named from a SESSION-GLOBAL counter —
    // `lambda x_8#` in a fresh JVM is `lambda x_31#` after other
    // queries planned in the same session (r18: the residual source
    // of the phantom plan_changes on the MinHash/array-fold family)
    .replaceAll("lambda ([a-zA-Z]+)_\\d+#", "lambda $1#")
    // scan-metadata fields (DataFilters etc.) render TRUNCATED at a
    // fixed raw width; raw exprId digit counts shift the cut point,
    // so the surviving prefix differs per session. A bracketed field
    // whose closing bracket was swallowed by the `...` is collapsed
    // entirely — its full content is already hashed from the plan
    // nodes above the scan. ANCHORED to the scan-metadata keys (r19,
    // per ADVICE): the old any-bracket rule also matched Spark's
    // `[a#, b#, ... N more fields]` elision in wide Project/Scan
    // output lists, erasing the first ~25 field names from the hash —
    // a real change confined to those fields would not have flipped
    // the fingerprint. (The field-count elision cuts at a FIELD COUNT,
    // not a raw width, so exprId digit shifts cannot move it — it is
    // deterministic and safe to hash.)
    .replaceAll(
      "(DataFilters|PartitionFilters|PushedFilters): \\[[^\\]]*\\.\\.\\.",
      "$1: [<trunc>")
    // shuffle partition counts in Exchange renders: for
    // ENSURE_REQUIREMENTS / REPARTITION_BY_COL shuffles the count is
    // spark.sql.shuffle.partitions — a CONFIG (= cores in local mode;
    // the driver benches the same code at 32 and 8 cores), not plan
    // shape, so the same code hashed differently per core count and
    // the cross-run plan-change gate fired on every shuffle-bearing
    // query (r18: 117 phantom changes on the 8-core rerun).
    // REPARTITION_BY_NUM counts normalize too: the library's explicit
    // counts are defaultParallelism-derived ([[graft.operators
    // .Parallelism.spread]] — explicit so AQE cannot coalesce the
    // deliberate spread), equally core-dependent. The cost — a literal
    // repartition(5)→repartition(9) edit no longer flips the gate —
    // trades a count-only tune for core-count-invariant hashes; the
    // exchange's EXISTENCE, keys and origin stay hashed.
    .replaceAll(", \\d+\\), (ENSURE_REQUIREMENTS|REPARTITION_BY_COL" +
      "|REPARTITION_BY_NUM)", ", <np>), $1")
    .replaceAll("RoundRobinPartitioning\\(\\d+\\)",
      "RoundRobinPartitioning(<np>)")

  /** Digest of `df`'s normalized physical plan (pre-execution). */
  def hash(df: DataFrame): String = {
    val plan = df.queryExecution.explainString(
      org.apache.spark.sql.execution.SimpleMode)
    val md = java.security.MessageDigest.getInstance("MD5")
    md.digest(normalize(plan).getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.take(16)
  }
}
