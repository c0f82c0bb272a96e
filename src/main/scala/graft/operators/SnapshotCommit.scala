package graft.operators

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Atomic snapshot commit protocol for versioned parquet sinks — the
  * engine-side analog of the reference loader's job atomicity
  * (`/root/reference/python/load.py:112-119`: a BigQuery load job
  * either fully lands or doesn't; the plain-parquet path needs the
  * same contract built in).
  *
  * Layout under a snapshot root:
  * {{{
  *   <root>/data/v<version>-<token>/   parquet files (write-once dirs)
  *   <root>/_commits/<version>         manifest: the data dir's name
  * }}}
  *
  * The protocol: data files land in a FRESH uniquely-named dir (never
  * overwritten, so a retry can't truncate files a racing reader has
  * open); the manifest is staged as a hidden `.tmp-*` file and then
  * RENAMED into place — the single atomic step (same-directory rename
  * is atomic on HDFS and POSIX; an object store without atomic rename
  * needs a table format instead — that swap is isolated here).
  *
  * Readers resolve snapshots ONLY through `_commits`: a writer crash
  * at ANY point — mid-data-file, between files, after data but before
  * the manifest rename — leaves garbage data files but no manifest, so
  * no reader ever sees a partial snapshot (crash-injection pinned in
  * SnapshotCommitSpec). Retries of version N write a new token'd data
  * dir and replace N's manifest; the previous version's files are
  * untouched until [[vacuum]].
  */
object SnapshotCommit {

  private def fsOf(spark: SparkSession, p: Path): FileSystem =
    p.getFileSystem(spark.sessionState.newHadoopConf())

  private def commitsDir(root: String) = new Path(root, "_commits")

  /** Publish `df` as snapshot `version` under `root`. With the default
    * `replaceExisting = true`, safe to call again for the same version
    * (retry semantics: last writer wins, atomically). Pass
    * `replaceExisting = false` for compare-and-swap publication — the
    * write REFUSES (ConcurrentModificationException) if `version` is
    * already committed, instead of silently clobbering a concurrent
    * writer's snapshot; maintenance jobs that picked their version
    * from `latest()` (e.g. [[Layout.compactCommitted]]) need this. */
  def write(df: DataFrame, root: String, version: Long,
      replaceExisting: Boolean = true): Unit = {
    require(version >= 0, s"version must be >= 0, got $version")
    val spark = df.sparkSession
    val token = java.util.UUID.randomUUID().toString.take(8)
    val dataName = s"v$version-$token"
    // mode("error"): the token makes the dir fresh; overwriting would
    // mean two writers chose the same token — fail loudly, not silently
    df.write.mode("error").parquet(s"$root/data/$dataName")

    val commits = commitsDir(root)
    val fs = fsOf(spark, commits)
    fs.mkdirs(commits)
    val tmp = new Path(commits, s".tmp-$version-$token")
    val out = fs.create(tmp, true)
    try out.write(dataName.getBytes("UTF-8")) finally out.close()
    val target = new Path(commits, version.toString)
    if (fs.exists(target)) {
      if (!replaceExisting)
        throw new java.util.ConcurrentModificationException(
          s"version $version already committed under $root; a concurrent " +
            "writer advanced the table — re-resolve latest() and retry")
      // HDFS rename won't replace an existing target: clear a prior
      // attempt's manifest first. The gap only affects retried versions —
      // readers fall back to the previous committed version meanwhile.
      fs.delete(target, false)
    }
    if (!fs.rename(tmp, target)) {
      // rename-to-existing fails on HDFS/POSIX: for CAS writers this IS
      // the lost race (a competitor renamed first); surface it as such
      if (!replaceExisting && fs.exists(target))
        throw new java.util.ConcurrentModificationException(
          s"lost the publish race for version $version under $root")
      throw new java.io.IOException(s"manifest rename failed for $target")
    }
  }

  /** All committed versions under `root`, ascending. */
  def versions(spark: SparkSession, root: String): Seq[Long] = {
    val commits = commitsDir(root)
    val fs = fsOf(spark, commits)
    if (!fs.exists(commits)) Seq.empty
    else fs.listStatus(commits).toSeq
      .map(_.getPath.getName)
      .filter(_.matches("\\d+"))
      .map(_.toLong)
      .sorted
  }

  /** Newest committed version strictly below `below` (exclusive) —
    * the read-committed cutoff an exactly-once writer needs (its own
    * retried version must not be its input). */
  def latestBelow(spark: SparkSession, root: String,
      below: Long = Long.MaxValue): Option[Long] =
    versions(spark, root).filter(_ < below).lastOption

  /** Resolve a committed version's data directory via its manifest. */
  def dataPath(spark: SparkSession, root: String, version: Long): String = {
    val manifest = new Path(commitsDir(root), version.toString)
    val fs = fsOf(spark, manifest)
    val in = fs.open(manifest)
    val name =
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
      finally in.close()
    require(name.matches("v\\d+-[0-9a-f]+"), s"corrupt manifest $manifest: '$name'")
    s"$root/data/$name"
  }

  def read(spark: SparkSession, root: String, version: Long): DataFrame =
    spark.read.parquet(dataPath(spark, root, version))

  /** Latest committed snapshot, or None before the first commit. */
  def latest(spark: SparkSession, root: String): Option[(Long, DataFrame)] =
    latestBelow(spark, root).map(v => v -> read(spark, root, v))

  /** Retention: keep the newest `keepLast` committed versions; delete
    * older manifests (manifest FIRST, then its data — the crash-safe
    * order: a data dir without a manifest is invisible garbage, a
    * manifest without data is a broken snapshot) and any data dir no
    * surviving manifest references. Uncommitted (orphan) data dirs are
    * only deleted once older than `orphanGraceMs` — a concurrent
    * writer's in-flight dir is orphaned-until-committed and must not
    * be swept mid-write. */
  def vacuum(spark: SparkSession, root: String, keepLast: Int,
      orphanGraceMs: Long = 60 * 60 * 1000L): Unit = {
    require(keepLast >= 1, s"keepLast must be >= 1, got $keepLast")
    val all = versions(spark, root)
    val (drop, keep) = all.splitAt(math.max(0, all.length - keepLast))
    val commits = commitsDir(root)
    val fs = fsOf(spark, commits)
    val keptDirs = keep.map(v => new Path(dataPath(spark, root, v)).getName).toSet
    drop.foreach(v => fs.delete(new Path(commits, v.toString), false))
    val dataRoot = new Path(root, "data")
    if (fs.exists(dataRoot)) {
      val now = System.currentTimeMillis()
      val versionOf = "v(\\d+)-.*".r
      fs.listStatus(dataRoot).toSeq
        .filter(_.isDirectory)
        .filterNot(st => keptDirs.contains(st.getPath.getName))
        .filter(st => now - st.getModificationTime >= orphanGraceMs)
        // re-check the manifest IMMEDIATELY before each delete: a
        // writer that was stalled past the grace window when versions()
        // was listed may have committed since — the dir its manifest
        // now references must survive (narrows the TOCTOU to the
        // check→delete gap; the grace window remains the primary
        // guard). Only the REFERENCED dir is protected — a retried
        // version's superseded attempts still sweep.
        .filterNot(st => st.getPath.getName match {
          case versionOf(v) if fs.exists(new Path(commits, v)) =>
            try new Path(dataPath(spark, root, v.toLong)).getName ==
              st.getPath.getName
            catch { case scala.util.control.NonFatal(_) => true } // keep on doubt
          case _ => false
        })
        .foreach(st => fs.delete(st.getPath, true))
    }
  }
}
