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
  *    `<version>.<seq>` created with create-if-absent — the
  *    conditional-PUT primitive object stores provide natively (PUT
  *    If-None-Match; an object becomes visible all-or-nothing). The
  *    entry NAME is deterministic per slot — the writer's random
  *    token lives only in the CONTENT (the data dir name) — so two
  *    racing writers that compute the same seq collide on the SAME
  *    path and exactly one create wins; the loser observes the
  *    failure and either retries at the next seq (replace semantics)
  *    or surfaces ConcurrentModificationException (CAS semantics).
  *    Readers resolve a version to its highest seq whose content
  *    VALIDATES, so a half-written entry (possible only on
  *    filesystems where create isn't content-atomic — exactly the
  *    local-FS crash simulation the spec runs) is skipped, never
  *    served. A retry appends the next seq.
  *
  *    S3 caveat: stock Hadoop S3A `create(path, overwrite = false)`
  *    is a CLIENT-SIDE existence check — the object only
  *    materializes at `close()`, with no If-None-Match unless
  *    conditional create is enabled. On `s3/s3a/s3n` this mode
  *    therefore REQUIRES `fs.s3a.create.conditional = true`
  *    (Hadoop 3.4.1+, maps the create to a conditional PUT) and
  *    refuses to publish without it — check-then-act dressed up as
  *    CAS would be the same silent-atomicity-loss RenameCommit
  *    refuses. GCS/ABFS connectors implement create-if-absent with
  *    generation/etag preconditions natively.
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
  /** Default: pick the right primitive for the root's scheme —
    * [[PutIfAbsentCommit]] on copy+delete object stores
    * ([[NonAtomicRenameSchemes]]), [[RenameCommit]] everywhere
    * rename is atomic. Removes the caller-must-know-their-scheme
    * foot-gun: an `s3a:` root publishes atomically with no explicit
    * mode argument, and every operator that threads the default
    * ([[graft.streaming.ScdUpsert]], [[Incremental]], [[Layout]])
    * inherits the same dispatch. */
  case object AutoCommit extends CommitMode
  /** Stage + same-directory rename; requires rename-atomic storage
    * (HDFS, POSIX, abfs). Refuses on copy+delete object stores. */
  case object RenameCommit extends CommitMode
  /** Immutable `<version>.<seq>` entries via create-if-absent — the
    * object-store-safe mode (conditional PUT; on s3 schemes requires
    * `fs.s3a.create.conditional = true`, see class doc). */
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

  /** Put-mode manifest entry name: `<version>.<seq>`. The optional
    * `-token` suffix admits LEGACY entries written before names were
    * deterministic (the token now lives only in the content). */
  private val EntryName = """(\d+)\.(\d+)(?:-[0-9a-f]+)?""".r

  /** Manifest content validated (None = absent/corrupt/half-written —
    * the put-mode reader skips it; see class doc). */
  private def readManifest(fs: FileSystem, p: Path): Option[String] =
    try {
      val in = fs.open(p)
      val s = try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
        finally in.close()
      Some(s).filter(_.matches("v\\d+-[0-9a-f]+"))
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Put-mode entries grouped from ONE directory listing, per version
    * ascending by (seq, name) — the name tie-break makes equal-seq
    * LEGACY token'd entries resolve deterministically regardless of
    * listStatus order (deterministic names can't collide at all). */
  private def entriesByVersion(paths: Seq[Path]): Map[Long, Seq[(Long, Path)]] =
    paths.flatMap { p =>
      p.getName match {
        case EntryName(v, s) => Some((v.toLong, s.toLong, p))
        case _ => None
      }
    }.groupBy(_._1).map { case (v, xs) =>
      v -> xs.map(t => (t._2, t._3)).sortBy { case (s, p) => (s, p.getName) }
    }

  /** Put-mode entries for `version`, ascending by (seq, name). */
  private def entriesOf(fs: FileSystem, commits: Path,
      version: Long): Seq[(Long, Path)] =
    if (!fs.exists(commits)) Seq.empty
    else entriesByVersion(fs.listStatus(commits).toSeq.map(_.getPath))
      .getOrElse(version, Seq.empty)

  /** Publish `df` as snapshot `version` under `root`. With the default
    * `replaceExisting = true`, safe to call again for the same version
    * (retry semantics: last writer wins, atomically). Pass
    * `replaceExisting = false` for compare-and-swap publication — the
    * write REFUSES (ConcurrentModificationException) if `version` is
    * already committed, instead of silently clobbering a concurrent
    * writer's snapshot; maintenance jobs that picked their version
    * from `latest()` (e.g. [[Layout.compactCommitted]]) need this.
    *
    * `mode` picks the atomic publication primitive (class doc): the
    * [[AutoCommit]] default dispatches on the root's scheme —
    * [[PutIfAbsentCommit]] where rename is copy+delete,
    * [[RenameCommit]] elsewhere. An EXPLICIT [[RenameCommit]] on an
    * object-store scheme still refuses (the caller asked for a
    * guarantee the store can't give). Both modes interoperate on the
    * same root: readers check the plain (rename-mode) manifest
    * first, then the highest valid entry. */
  def write(df: DataFrame, root: String, version: Long,
      replaceExisting: Boolean = true,
      mode: CommitMode = AutoCommit): Unit = {
    require(version >= 0, s"version must be >= 0, got $version")
    val spark = df.sparkSession
    val token = java.util.UUID.randomUUID().toString.take(8)
    val dataName = s"v$version-$token"
    val commits = commitsDir(root)
    val hconf = spark.sessionState.newHadoopConf()
    val fs = commits.getFileSystem(hconf)
    val scheme = Option(fs.getUri.getScheme).map(_.toLowerCase).getOrElse("")
    val effectiveMode = mode match {
      case AutoCommit =>
        if (NonAtomicRenameSchemes.contains(scheme)) PutIfAbsentCommit
        else RenameCommit
      case m => m
    }
    effectiveMode match {
      case AutoCommit =>
        throw new IllegalStateException("unreachable: AutoCommit resolved above")
      case RenameCommit =>
        if (NonAtomicRenameSchemes.contains(scheme))
          throw new IllegalArgumentException(
            s"RenameCommit on '$scheme' would publish WITHOUT atomicity " +
              "(rename there is copy+delete) — pass mode = PutIfAbsentCommit, " +
              "whose create-if-absent entries map to the store's conditional PUT")
      case PutIfAbsentCommit =>
        // Stock S3A create(overwrite = false) is a client-side
        // existence check with the object materializing only at
        // close() — NOT an If-None-Match PUT. Without conditional
        // create enabled, this mode would be check-then-act dressed
        // up as CAS; refuse up front, exactly like RenameCommit's
        // scheme refusal. (Conf read at write time, not fs.getConf:
        // Hadoop's FileSystem cache pins the conf of FIRST
        // instantiation, which would mask a later enablement.)
        if (Set("s3", "s3a", "s3n").contains(scheme) &&
            !hconf.getBoolean("fs.s3a.create.conditional", false))
          throw new IllegalArgumentException(
            s"PutIfAbsentCommit on '$scheme' requires conditional create: " +
              "set fs.s3a.create.conditional=true (Hadoop 3.4.1+) so " +
              "create-if-absent maps to the store's conditional PUT — " +
              "without it the publish is a non-atomic existence check")
    }
    // mode("error"): the token makes the dir fresh; overwriting would
    // mean two writers chose the same token — fail loudly, not silently
    df.write.mode("error").parquet(s"$root/data/$dataName")
    fs.mkdirs(commits)

    effectiveMode match {
      case AutoCommit =>
        throw new IllegalStateException("unreachable: AutoCommit resolved above")
      case RenameCommit =>
        val tmp = new Path(commits, s".tmp-$version-$token")
        val out = fs.create(tmp, true)
        try out.write(dataName.getBytes("UTF-8")) finally out.close()
        val target = new Path(commits, version.toString)
        // CAS must see PUT-mode commits too: without this check a
        // rename-mode CAS writer racing a put-mode committer would
        // publish a plain manifest that takes READ precedence over
        // the existing entries — exactly the clobber CAS exists to
        // refuse. (replaceExisting = true over entries is fine: the
        // plain manifest supersedes by precedence, last writer wins.)
        if (!replaceExisting && entriesOf(fs, commits, version).nonEmpty)
          throw new java.util.ConcurrentModificationException(
            s"version $version already committed (put-mode) under $root; " +
              "a concurrent writer advanced the table — re-resolve latest() " +
              "and retry")
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
        val plain = new Path(commits, version.toString)
        var attempts = 0
        var done = false
        while (!done) {
          val existingSeqs = entriesOf(fs, commits, version)
          if (!replaceExisting && (fs.exists(plain) || existingSeqs.nonEmpty))
            throw new java.util.ConcurrentModificationException(
              s"version $version already committed under $root; a concurrent " +
                "writer advanced the table — re-resolve latest() and retry")
          val seq = existingSeqs.lastOption.map(_._1 + 1).getOrElse(0L)
          // Deterministic per-slot name: create-if-absent on the EXACT
          // path is the mutual exclusion. Two racing writers that
          // computed the same seq collide on the same entry — one
          // create wins, the loser lands in the catch below. (The
          // token is only in the CONTENT; a token'd name would give
          // each racer a private path and both would "win".)
          val entry = new Path(commits, s"$version.$seq")
          try {
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
        // Supersede a rename-mode plain manifest: dataPath prefers the
        // plain file, so leaving it in place after a put-mode retry
        // would silently unpublish this commit (readers resolve the
        // old dir; vacuum eventually sweeps the new one). Deleting it
        // AFTER the entry lands flips resolution to the highest entry.
        // Crash window (entry landed, plain not yet deleted): readers
        // keep serving the plain version — stale but complete — and
        // vacuum protects BOTH referenced dirs (see referencedDirs),
        // so the next retry completes the supersede without data loss.
        if (replaceExisting && fs.exists(plain)) fs.delete(plain, false)
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
      // ONE listing, grouped — per-version re-listing was O(V·N)
      // directory LISTs, painful on object stores as versions grow
      val names = fs.listStatus(commits).toSeq.map(_.getPath)
      val plain = names.map(_.getName).filter(_.matches("\\d+")).map(_.toLong)
      val grouped = entriesByVersion(names)
      val entryVersions = grouped.keys.toSeq
        .filterNot(plain.contains)
        .filter(v => grouped(v).reverseIterator
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
    * append-only — a retry supersedes, never deletes (the one
    * deletion a put-mode retry performs — the cross-mode supersede
    * of a rename-mode plain manifest — happens only AFTER its own
    * entry landed, so resolution flips, never gaps). */
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

  /** Data-dir names a reader could EVER resolve for `version`: the
    * plain manifest's target (if valid) plus the highest valid
    * put-mode entry's. Normally these coincide in one name; they
    * differ only in the put-mode supersede crash window (entry
    * landed, plain manifest not yet deleted) — [[vacuum]] must
    * protect BOTH or the superseding commit's data dir would sweep
    * as an "orphan" while its entry still references it. Empty set
    * = uncommitted. */
  private def referencedDirs(fs: FileSystem, commits: Path,
      version: Long): Set[String] = {
    val fromPlain = readManifest(fs, new Path(commits, version.toString))
    val fromEntry = entriesOf(fs, commits, version).reverseIterator
      .flatMap { case (_, p) => readManifest(fs, p) }.nextOption()
    fromPlain.toSet ++ fromEntry.toSet
  }

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
    // one listing for every dropped version's entries (the same
    // O(V·N) LIST concern versions() had)
    val dropEntries =
      if (drop.nonEmpty && fs.exists(commits))
        entriesByVersion(fs.listStatus(commits).toSeq.map(_.getPath))
      else Map.empty[Long, Seq[(Long, Path)]]
    drop.foreach { v =>
      fs.delete(new Path(commits, v.toString), false)
      dropEntries.getOrElse(v, Seq.empty).foreach {
        case (_, p) => fs.delete(p, false) }
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
        // re-check the manifests IMMEDIATELY before each delete: a
        // writer that was stalled past the grace window when versions()
        // was listed may have committed since — the dir its manifest
        // now references must survive (narrows the TOCTOU to the
        // check→delete gap; the grace window remains the primary
        // guard). referencedDirs covers BOTH manifest styles AND the
        // put-mode supersede crash window where the plain manifest and
        // the highest entry briefly reference different dirs — a
        // retried version's OTHER superseded attempts still sweep.
        .filterNot(st => st.getPath.getName match {
          case versionOf(v) =>
            try referencedDirs(fs, commits, v.toLong)
              .contains(st.getPath.getName)
            catch {
              case scala.util.control.NonFatal(_) => true // keep on doubt
            }
          case _ => false
        })
        .foreach(st => fs.delete(st.getPath, true))
    }
  }
}
