package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Per-batch Bloom SIDECARS for append-only [[BatchStore]] roots —
  * the layout that makes incremental serves history-FLAT: each
  * committed `batch=N` dir gets `_bloom/batch=N.bf`, ONE sketch over
  * that batch's probe-able keys (tagged strings — `"d:<digest>"`,
  * `"b:<band>:<key>"`, `"h:<band>:<value>"` — so one sketch covers
  * several key families and one write job replaces one-per-family),
  * and a serve reads only the batch dirs whose sketch might contain
  * one of the delta's keys.
  *
  * Correctness posture, shared by every user ([[Dedup]]'s signature
  * store, the Hamming sketch store): the sidecar is an OPTIMIZATION
  * commit, never a correctness one —
  *  - sketches have NO false negatives, so pruned ≡ flat verdicts;
  *  - a batch without a sidecar (legacy, crash between batch commit
  *    and sidecar rename, unknown format) is ALWAYS scanned;
  *  - a sidecar not covering the probed tag (e.g. digest-only store
  *    asked for band keys) is always scanned;
  *  - erasure/purge leave stale-SUPERSET sketches — extra scans,
  *    never missed matches; compaction re-derives.
  *
  * Scale shape: probes run as ONE executor-side job over the sidecar
  * FILES (`binaryFiles` — sketches are never driver-accumulated or
  * broadcast; a year of 10M-doc daily batches is ~365 × ~50 MB read
  * distributed, each task early-exiting on its first probe hit), fed
  * by probe-key collects hard-capped at [[MaxDriverProbeKeys]]
  * strings on the driver — an over-cap delta streams through in
  * bounded chunks with a shrinking batch set instead of
  * materializing gigabytes driver-side. [[Fpp]] is sized PER SERVE,
  * not per probe: a
  * serve tests the whole delta against every batch's sketch, so the
  * per-batch clean probability is (1-fpp)^|delta| — at the classic
  * 0.01 a 500-doc delta false-positives on essentially every batch
  * and pruning silently degrades to the flat scan; 1e-8 keeps
  * expected false scans ≤ ~0.01/batch up to million-doc deltas at
  * ~4.8 bytes/element. Serves below [[MinBatchesForPrune]] committed
  * batches skip the probe job entirely (layout constants vs small
  * stores — the line-df-store lesson). */
private[graft] object BatchBlooms {

  val Fpp: Double = 1e-8
  private val Magic: Int = 0x424c4d32 // "BLM2"
  val MinBatchesForPrune: Int = 4

  def path(root: String, batchId: Long): org.apache.hadoop.fs.Path =
    new org.apache.hadoop.fs.Path(root, s"_bloom/batch=$batchId.bf")

  /** Stage + rename one batch's sidecar: ONE sketch over `keys` (a
    * single string column of ALREADY-TAGGED values — build them as
    * `"<tag>:<value>"` to match [[hits]]' probe tagging), with the
    * covered tag list recorded in the header so a serve probing an
    * uncovered tag scans the batch instead of trusting the sketch.
    * The sketch is length-prefix FRAMED: Spark's
    * `BloomFilter.readFrom(InputStream)` buffers the whole remaining
    * stream, so bare back-to-back layouts are unreadable. Idempotent
    * overwrite (a re-derived sidecar replaces the old). */
  def write(spark: SparkSession, root: String, batchId: Long,
      keys: DataFrame, expected: Long, tags: Seq[String]): Unit = {
    val bloom = keys.na.drop().stat
      .bloomFilter(keys.columns.head, math.max(expected, 64L), Fpp)
    val p = path(root, batchId)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    fs.mkdirs(p.getParent)
    val tmp = new org.apache.hadoop.fs.Path(p.getParent,
      s".batch=$batchId-${java.util.UUID.randomUUID().toString.take(8)}")
    val out = fs.create(tmp, false)
    try {
      val dos = new java.io.DataOutputStream(
        new java.io.BufferedOutputStream(out))
      dos.writeInt(Magic)
      dos.writeInt(tags.size)
      tags.foreach(dos.writeUTF)
      val buf = new java.io.ByteArrayOutputStream()
      bloom.writeTo(buf)
      dos.writeInt(buf.size())
      buf.writeTo(dos)
      dos.flush()
    } finally out.close()
    if (fs.exists(p)) fs.delete(p, false)
    require(fs.rename(tmp, p), s"bloom sidecar rename $tmp -> $p failed")
  }

  /** Delete sidecars whose batch no longer exists (post-compaction
    * hygiene) and return the committed batch ids that LACK one — the
    * re-derive worklist. */
  def danglingSweep(spark: SparkSession, root: String): Seq[Long] = {
    val rootPath = new org.apache.hadoop.fs.Path(root)
    val fs = rootPath.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(rootPath)) return Seq.empty
    val ids = fs.listStatus(rootPath).toSeq
      .filter(st => st.isDirectory && st.getPath.getName.startsWith("batch="))
      .map(_.getPath.getName.stripPrefix("batch=").toLong).toSet
    val bloomDir = new org.apache.hadoop.fs.Path(root, "_bloom")
    if (fs.exists(bloomDir))
      fs.listStatus(bloomDir).toSeq
        .filter { st =>
          val n = st.getPath.getName
          n.startsWith("batch=") && n.endsWith(".bf") &&
            !ids.contains(n.stripPrefix("batch=").stripSuffix(".bf").toLong)
        }
        .foreach(st => fs.delete(st.getPath, false))
    ids.toSeq.sorted.filterNot(id => fs.exists(path(root, id)))
  }

  /** Driver-memory bound on the probe-key gather: per group, at most
    * this many tagged key strings are materialized on the driver AT A
    * TIME. Groups at or below the cap take the one-collect fast path
    * (ONE shared probe job for all groups — the gate-scale common
    * case); a group above it switches to CHUNKED probing — the
    * distinct'd keys stream to the driver `toLocalIterator`-style in
    * cap-sized chunks, each chunk runs its own probe job over only
    * the batches no earlier chunk already hit, and the loop
    * early-exits once every batch is hit. So a 10M-doc slice × 9
    * tagged keys probes in ~90 bounded chunks instead of one ~90M-
    * string driver materialization, pruning power intact (a batch is
    * pruned only if EVERY chunk probed it clean — identical verdicts
    * to the one-shot path by OR-distributivity). Test seam: specs
    * lower it to force the chunked path. */
  private[graft] var MaxDriverProbeKeys: Int = 1 << 20

  /** ONE probe job over the sidecar files: for each probe GROUP
    * `(tag, values)` the committed batch ids (strictly before
    * `beforeBatch` when set) whose sketch might contain any
    * `"<tag>:<value>"` — plus, per group, every batch whose sidecar
    * is absent, corrupt, unknown-format, or does not cover the tag
    * (all sound: scanned, not trusted). `None` = don't prune at all
    * (fewer than [[MinBatchesForPrune]] batches, or no sidecars) —
    * callers scan flat and pay zero probe jobs. Driver memory is
    * bounded by [[MaxDriverProbeKeys]] regardless of delta size. */
  def hits(spark: SparkSession, root: String,
      groups: Seq[(String, DataFrame)],
      beforeBatch: Option[Long]): Option[Seq[Seq[Long]]] = {
    val rootPath = new org.apache.hadoop.fs.Path(root)
    val fs = rootPath.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(rootPath)) return None
    val ids = fs.listStatus(rootPath).toSeq
      .filter(st => st.isDirectory && st.getPath.getName.startsWith("batch="))
      .map(_.getPath.getName.stripPrefix("batch=").toLong)
      .filter(id => beforeBatch.forall(id < _))
    if (ids.size < MinBatchesForPrune) return None
    val withSidecar = ids.filter(id => fs.exists(path(root, id))).toSet
    if (withSidecar.isEmpty) return None
    val noSidecar = ids.filterNot(withSidecar)
    val tags = groups.map(_._1)
    // bounded probe-key gather (the incremental contract's broadcast
    // side, now with a hard driver cap): `limit(cap + 1)` detects an
    // over-cap group with delta-sized work and never materializes
    // more than cap + 1 strings
    val gathered: Seq[Either[DataFrame, Array[String]]] =
      groups.map { case (tag, df) =>
        val keys = df.na.drop().distinct()
        val head = keys.limit(MaxDriverProbeKeys + 1).collect()
          .map(r => tag + ":" + r.getString(0))
        if (head.length <= MaxDriverProbeKeys) Right(head) else Left(keys)
      }
    // fast path: every at-cap group shares ONE probe job
    val smallProbe = gathered.map(_.toOption)
    val smallVerdicts: Map[Long, Seq[Boolean]] =
      if (smallProbe.exists(_.isDefined))
        probeJob(spark, root, withSidecar, smallProbe, tags)
      else Map.empty
    Some(gathered.zipWithIndex.map { case (g, gi) =>
      val hitIds: Seq[Long] = g match {
        case Right(_) =>
          // a wanted batch with no verdict (sidecar vanished between
          // the existence check and the job's listing) scans — absent
          // must never read as clean
          withSidecar.toSeq.filter(id =>
            smallVerdicts.get(id).forall(_(gi)))
        case Left(keys) =>
          chunkedHits(spark, root, withSidecar, keys, tags(gi))
      }
      (hitIds ++ noSidecar).distinct.sorted
    })
  }

  /** The over-cap path: stream the distinct'd keys to the driver in
    * [[MaxDriverProbeKeys]]-sized chunks, probing each against only
    * the batches not yet hit. Verdict-identical to the one-shot probe:
    * `∃ key ∈ delta` distributes over chunks, and a batch is removed
    * from the probe set exactly when some chunk hits it. */
  private def chunkedHits(spark: SparkSession, root: String,
      wanted: Set[Long], keys: DataFrame, tag: String): Seq[Long] = {
    import scala.jdk.CollectionConverters._
    val persisted =
      keys.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val hitSet = scala.collection.mutable.Set.empty[Long]
      var remaining = wanted
      val chunks = persisted.toLocalIterator().asScala
        .map(r => tag + ":" + r.getString(0))
        .grouped(MaxDriverProbeKeys)
      while (chunks.hasNext && remaining.nonEmpty) {
        val chunk = chunks.next().toArray
        val verdicts = probeJob(spark, root, remaining,
          Seq(Some(chunk)), Seq(tag))
        val chunkHits = verdicts.collect { case (id, v) if v.head => id }
        hitSet ++= chunkHits
        remaining --= chunkHits
      }
      hitSet.toSeq
    } finally persisted.unpersist(blocking = false)
  }

  /** The executor-side probe: binaryFiles over the sidecar glob, each
    * task deserializing only its `wanted` batch's sketch and
    * early-exiting on the first hit per group. Every id in `wanted`
    * gets a verdict row — a batch whose sidecar file is gone by job
    * time (concurrent sweep) comes back all-true, never silently
    * absent. A `None` group (over-cap, probed separately) reads as
    * all-true too; callers ignore those columns. */
  private def probeJob(spark: SparkSession, root: String,
      wanted: Set[Long], probe: Seq[Option[Array[String]]],
      tags: Seq[String]): Map[Long, Seq[Boolean]] = {
    val bc = spark.sparkContext.broadcast(probe)
    try {
      val glob = new org.apache.hadoop.fs.Path(root, "_bloom").toString +
        "/batch=*.bf"
      val perBatch = spark.sparkContext.binaryFiles(glob)
        .flatMap { case (pathStr, pds) =>
          val name = pathStr.substring(pathStr.lastIndexOf('/') + 1)
          val id = name.stripPrefix("batch=").stripSuffix(".bf").toLong
          if (!wanted.contains(id)) None
          else {
            val in = new java.io.DataInputStream(pds.open())
            val verdicts: Seq[Boolean] =
              try {
                if (in.readInt() != Magic) tags.map(_ => true)
                else {
                  val covered =
                    (0 until in.readInt()).map(_ => in.readUTF()).toSet
                  val bytes = new Array[Byte](in.readInt())
                  in.readFully(bytes)
                  val bf = org.apache.spark.util.sketch.BloomFilter.readFrom(
                    new java.io.ByteArrayInputStream(bytes))
                  tags.zipWithIndex.map { case (tag, gi) =>
                    bc.value(gi) match {
                      case Some(ks) => !covered.contains(tag) ||
                        ks.exists(bf.mightContainString)
                      case None => true
                    }
                  }
                }
              } catch {
                case scala.util.control.NonFatal(_) => tags.map(_ => true)
              } finally in.close()
            Some((id, verdicts))
          }
        }.collect().toMap
      wanted.iterator
        .map(id => id -> perBatch.getOrElse(id, tags.map(_ => true)))
        .toMap
    } finally bc.destroy()
  }
}
