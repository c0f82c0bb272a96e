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
  * open); publication of the manifest is the single atomic step, with
  * TWO interchangeable primitives behind [[CommitMode]]:
  *
  *  - [[RenameCommit]] (default): the manifest is staged as a hidden
  *    `.tmp-*` file and RENAMED into place — atomic on HDFS and
  *    POSIX. On an object-store scheme whose rename is copy+delete
  *    (s3/s3a/gs/…) this mode REFUSES to publish instead of silently
  *    losing its crash guarantee.
  *  - [[PutIfAbsentCommit]]: manifests are IMMUTABLE numbered entries
  *    `<version>.<seq>-<token>` created with create-if-absent — the
  *    conditional-PUT primitive object stores provide natively (PUT
  *    If-None-Match; an object becomes visible all-or-nothing).
  *    Readers resolve a version to its highest seq whose content
  *    VALIDATES, so a half-written entry (possible only on
  *    filesystems where create isn't content-atomic — exactly the
  *    local-FS crash simulation the spec runs) is skipped, never
  *    served. A retry appends the next seq; a lost create race in
  *    CAS mode surfaces as ConcurrentModificationException.
  *
  * Readers resolve snapshots ONLY through `_commits`: a writer crash
  * at ANY point — mid-data-file, between files, after data but before
  * the manifest publish — leaves garbage data files but no manifest,
  * so no reader ever sees a partial snapshot (crash-injection pinned
  * in SnapshotCommitSpec for BOTH modes). Retries of version N write
  * a new token'd data dir and replace (rename mode) or supersede
  * (put mode) N's manifest; the previous version's files are
  * untouched until [[vacuum]].
  */
object SnapshotCommit {

  /** How the manifest — the single atomic publication step — lands. */
  sealed trait CommitMode
  /** Stage + same-directory rename; requires rename-atomic storage
    * (HDFS, POSIX, abfs). Refuses on copy+delete object stores. */
  case object RenameCommit extends CommitMode
  /** Immutable `<version>.<seq>-<token>` entries via create-if-absent
    * — the object-store-safe mode (conditional PUT). */
  case object PutIfAbsentCommit extends CommitMode

  /** Schemes whose FileSystem `rename` is a non-atomic copy+delete
    * (or visibility-delayed) emulation — RenameCommit must refuse
    * rather than publish without its crash guarantee. HDFS, `file`,
    * `viewfs`, and abfs (ADLS Gen2) rename atomically and stay
    * allowed. */
  private val NonAtomicRenameSchemes =
    Set("s3", "s3a", "s3n", "gs", "wasb", "wasbs", "oss", "cos", "swift")

  private def fsOf(spark: SparkSession, p: Path): FileSystem =
    p.getFileSystem(spark.sessionState.newHadoopConf())

  private def commitsDir(root: String) = new Path(root, "_commits")

  /** Put-mode manifest entry name: `<version>.<seq>-<token>`. */
  private val EntryName = """(\d+)\.(\d+)-[0-9a-f]+""".r

  /** Manifest content validated (None = absent/corrupt/half-written —
    * the put-mode reader skips it; see class doc). */
  private def readManifest(fs: FileSystem, p: Path): Option[String] =
    try {
      val in = fs.open(p)
      val s = try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
        finally in.close()
      Some(s).filter(_.matches("v\\d+-[0-9a-f]+"))
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Put-mode entries for `version`, ascending by seq. */
  private def entriesOf(fs: FileSystem, commits: Path,
      version: Long): Seq[(Long, Path)] =
    if (!fs.exists(commits)) Seq.empty
    else fs.listStatus(commits).toSeq.map(_.getPath).flatMap { p =>
      p.getName match {
        case EntryName(v, s) if v.toLong == version => Some((s.toLong, p))
        case _ => None
      }
    }.sortBy(_._1)

  /** Publish `df` as snapshot `version` under `root`. With the default
    * `replaceExisting = true`, safe to call again for the same version
    * (retry semantics: last writer wins, atomically). Pass
    * `replaceExisting = false` for compare-and-swap publication — the
    * write REFUSES (ConcurrentModificationException) if `version` is
    * already committed, instead of silently clobbering a concurrent
    * writer's snapshot; maintenance jobs that picked their version
    * from `latest()` (e.g. [[Layout.compactCommitted]]) need this.
    *
    * `mode` picks the atomic publication primitive (class doc):
    * [[RenameCommit]] refuses on object-store schemes where rename
    * is not atomic; [[PutIfAbsentCommit]] publishes an immutable
    * numbered entry via create-if-absent and is safe there. Both
    * modes interoperate on the same root: readers check the plain
    * (rename-mode) manifest first, then the highest valid entry. */
  def write(df: DataFrame, root: String, version: Long,
      replaceExisting: Boolean = true,
      mode: CommitMode = RenameCommit): Unit = {
    require(version >= 0, s"version must be >= 0, got $version")
    val spark = df.sparkSession
    val token = java.util.UUID.randomUUID().toString.take(8)
    val dataName = s"v$version-$token"
    val commits = commitsDir(root)
    val fs = fsOf(spark, commits)
    if (mode == RenameCommit) {
      val scheme = Option(fs.getUri.getScheme).map(_.toLowerCase).getOrElse("")
      if (NonAtomicRenameSchemes.contains(scheme))
        throw new IllegalArgumentException(
          s"RenameCommit on '$scheme' would publish WITHOUT atomicity " +
            "(rename there is copy+delete) — pass mode = PutIfAbsentCommit, " +
            "whose create-if-absent entries map to the store's conditional PUT")
    }
    // mode("error"): the token makes the dir fresh; overwriting would
    // mean two writers chose the same token — fail loudly, not silently
    df.write.mode("error").parquet(s"$root/data/$dataName")
    fs.mkdirs(commits)

    mode match {
      case RenameCommit =>
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

      case PutIfAbsentCommit =>
        var attempts = 0
        var done = false
        while (!done) {
          val existingSeqs = entriesOf(fs, commits, version)
          val plainExists = fs.exists(new Path(commits, version.toString))
          if (!replaceExisting && (plainExists || existingSeqs.nonEmpty))
            throw new java.util.ConcurrentModificationException(
              s"version $version already committed under $root; a concurrent " +
                "writer advanced the table — re-resolve latest() and retry")
          val seq = existingSeqs.lastOption.map(_._1 + 1).getOrElse(0L)
          val entry = new Path(commits, s"$version.$seq-$token")
          try {
            // overwrite = false: create-if-absent IS the atomic step —
            // on a real object store this maps to conditional PUT
            val out = fs.create(entry, false)
            try out.write(dataName.getBytes("UTF-8")) finally out.close()
            done = true
          } catch {
            case e: java.io.IOException if fs.exists(entry) =>
              // lost the create race for this seq: a competitor owns it
              if (!replaceExisting)
                throw new java.util.ConcurrentModificationException(
                  s"lost the publish race for version $version under $root")
              attempts += 1
              if (attempts > 16) throw new java.io.IOException(
                s"could not claim a manifest entry seq for v$version", e)
          }
        }
    }
  }

  /** All committed versions under `root`, ascending: rename-mode
    * plain manifests plus put-mode versions with at least one VALID
    * entry (an entry that fails content validation is a crashed
    * writer's residue, not a commit). */
  def versions(spark: SparkSession, root: String): Seq[Long] = {
    val commits = commitsDir(root)
    val fs = fsOf(spark, commits)
    if (!fs.exists(commits)) Seq.empty
    else {
      val names = fs.listStatus(commits).toSeq.map(_.getPath)
      val plain = names.map(_.getName).filter(_.matches("\\d+")).map(_.toLong)
      val entryVersions = names
        .collect { case p => p.getName match {
          case EntryName(v, _) => Some(v.toLong); case _ => None } }
        .flatten.distinct
        .filterNot(plain.contains)
        .filter(v => entriesOf(fs, commits, v).reverseIterator
          .exists { case (_, p) => readManifest(fs, p).isDefined })
      (plain ++ entryVersions).distinct.sorted
    }
  }

  /** Newest committed version strictly below `below` (exclusive) —
    * the read-committed cutoff an exactly-once writer needs (its own
    * retried version must not be its input). */
  def latestBelow(spark: SparkSession, root: String,
      below: Long = Long.MaxValue): Option[Long] =
    versions(spark, root).filter(_ < below).lastOption

  /** Resolve a committed version's data directory via its manifest:
    * the plain (rename-mode) manifest wins, else the highest
    * put-mode entry whose content validates.
    *
    * Explicit-version caveat (applies to [[read]] too): a
    * rename-mode RETRY of version N with `replaceExisting = true`
    * republishes via delete-then-rename, so an explicit-version
    * reader racing that retry can observe a FileNotFound window —
    * only `latest()`/`latestBelow()` readers degrade gracefully
    * (they re-resolve to the previous committed version).
    * Time-travel readers that must never hit that window should
    * publish with [[PutIfAbsentCommit]], whose entries are
    * append-only — a retry supersedes, never deletes. */
  def dataPath(spark: SparkSession, root: String, version: Long): String = {
    val commits = commitsDir(root)
    val fs = fsOf(spark, commits)
    val plain = new Path(commits, version.toString)
    val name =
      if (fs.exists(plain)) {
        val in = fs.open(plain)
        val s = try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
          finally in.close()
        require(s.matches("v\\d+-[0-9a-f]+"), s"corrupt manifest $plain: '$s'")
        s
      } else entriesOf(fs, commits, version).reverseIterator
        .flatMap { case (_, p) => readManifest(fs, p) }
        .nextOption()
        .getOrElse(throw new java.io.FileNotFoundException(
          s"no committed manifest for version $version under $root"))
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
    drop.foreach { v =>
      fs.delete(new Path(commits, v.toString), false)
      entriesOf(fs, commits, v).foreach { case (_, p) => fs.delete(p, false) }
    }
    // crashed rename-mode writers leak staged `.tmp-*` manifests in
    // _commits forever (nothing else references them); sweep the ones
    // older than the grace window — an in-flight writer's fresh tmp
    // file survives, same contract as orphan data dirs below
    if (fs.exists(commits)) {
      val now = System.currentTimeMillis()
      fs.listStatus(commits).toSeq
        .filter(st => st.getPath.getName.startsWith(".tmp-"))
        .filter(st => now - st.getModificationTime >= orphanGraceMs)
        .foreach(st => fs.delete(st.getPath, false))
    }
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
        // version's superseded attempts still sweep. dataPath resolves
        // BOTH manifest styles (plain rename-mode file and put-mode
        // entries), so put-committed dirs are protected too.
        .filterNot(st => st.getPath.getName match {
          case versionOf(v) =>
            try new Path(dataPath(spark, root, v.toLong)).getName ==
              st.getPath.getName
            catch {
              case _: java.io.FileNotFoundException => false // uncommitted
              case scala.util.control.NonFatal(_) => true    // keep on doubt
            }
          case _ => false
        })
        .foreach(st => fs.delete(st.getPath, true))
    }
  }
}
