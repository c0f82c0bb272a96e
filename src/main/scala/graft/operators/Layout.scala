package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-dimensional data layout: Z-order (Morton) clustering — the
  * at-rest file organization that makes BOTH `WHERE dim_a BETWEEN …`
  * and `WHERE dim_b BETWEEN …` prune files, where a plain sort serves
  * only its leading column.
  *
  * At 100 TB the mechanism is: compute the interleaved Morton value,
  * range-partition and sort the write by it, and let parquet per-file
  * column min/max statistics do the pruning — every file covers a
  * small aligned square of the (a, b) domain instead of a thin full-
  * width stripe. No reader cooperation needed; scan pruning falls out
  * of ordinary parquet stats (LayoutSpec measures the bounding-box
  * shrinkage on real files).
  *
  * The interleave is plain integer arithmetic (shift/mask/sum of
  * disjoint bits), so it is reproducible in any engine — q78 gates the
  * bucketing cross-engine against DuckDB.
  */
object Layout {

  /** Morton/Z-order interleave of two already-quantized non-negative
    * dimensions (`a`, `b` in `[0, 2^bits)`): bit `i` of `a` lands at
    * even position `2i`, bit `i` of `b` at odd position `2i+1`.
    * Disjoint bits sum without carries — the composition stays inside
    * whole-stage codegen. */
  def morton2(a: Column, b: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1,31], got $bits")
    (0 until bits).map { i =>
      shiftright(a, i).bitwiseAND(lit(1L)) * lit(1L << (2 * i)) +
        shiftright(b, i).bitwiseAND(lit(1L)) * lit(1L << (2 * i + 1))
    }.reduce(_ + _)
  }

  /** DuckDB mirror of [[morton2]] for oracle SQL. */
  def morton2Sql(a: String, b: String, bits: Int): String =
    (0 until bits).map { i =>
      s"((($a) >> $i) & 1) * ${1L << (2 * i)} + ((($b) >> $i) & 1) * ${1L << (2 * i + 1)}"
    }.mkString("(", " + ", ")")

  /** Write `df` Z-ordered on two quantized dimensions: range-partition
    * on the Morton value (balanced output files even when the domain
    * is skewed — the partitioner samples actual z values), sort within
    * each partition, drop the helper column. Readers filter on the
    * ORIGINAL columns; parquet row-group stats prune. */
  def zorderWrite(df: DataFrame, a: Column, b: Column, bits: Int,
      numFiles: Int, path: String): Unit = {
    require(!df.columns.contains("__z"), "column __z already exists")
    df.withColumn("__z", morton2(a, b, bits))
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode("overwrite").parquet(path)
  }

  /** Small-file compaction — the table-maintenance pass every
    * incremental sink eventually needs: streaming/daily writers leave
    * hundreds of KB-scale files per partition, and at 100 TB the scan
    * cost becomes dominated by per-file open/footer overhead and the
    * driver's file-listing, not by bytes. Rewrites `srcPath` into
    * `ceil(bytes / targetBytes)` output files (size measured from the
    * source files themselves), optionally sorted by `clusterBy` so the
    * rewrite doubles as a clustering pass (per-file min/max stats
    * tighten — the cheap half of [[zorderWrite]]).
    *
    * Returns (filesBefore, filesAfter). The rewrite is one
    * `repartition`/`repartitionByRange` shuffle of the partition being
    * compacted — compact partition-by-partition, not the whole table
    * at once. Not atomic on its own: production wraps it in a
    * staging-dir-then-rename (or a table format's commit protocol);
    * the overwrite here is the local-filesystem simplification. */
  def compact(spark: org.apache.spark.sql.SparkSession, srcPath: String,
      destPath: String, targetBytes: Long,
      clusterBy: Seq[Column] = Nil): (Int, Int) = {
    require(targetBytes > 0, s"targetBytes must be positive, got $targetBytes")
    // normalize through the Hadoop FileSystem before comparing: raw
    // string equality lets "/t" vs "/t/" (or relative vs absolute
    // spellings) bypass the guard and clobber the source mid-scan
    val conf = spark.sessionState.newHadoopConf()
    def qualified(p: String) = {
      val hp = new org.apache.hadoop.fs.Path(p)
      hp.getFileSystem(conf).makeQualified(hp)
    }
    val (qs, qd) = (qualified(srcPath), qualified(destPath))
    // nesting is as destructive as equality: dest under src means later
    // reads of src double-count the compacted rows; src under dest
    // means the overwrite deletes its own input
    def within(child: org.apache.hadoop.fs.Path,
        parent: org.apache.hadoop.fs.Path): Boolean =
      Iterator.iterate(child)(_.getParent).takeWhile(_ != null).contains(parent)
    require(qs != qd && !within(qd, qs) && !within(qs, qd),
      "in-place or nested compaction would read and clobber (or double-count) " +
        s"the same files; stage to a disjoint dir (src=$qs dest=$qd)")
    val df = spark.read.parquet(srcPath)
    val files = df.inputFiles
    // size through the Hadoop FS, not java.io.File: File.length is a
    // silent 0 for hdfs://s3a:// URIs and would collapse the rewrite
    // to a single giant file
    // Path(String), not Path(new URI(f)): inputFiles strings are NOT
    // percent-encoded, so a path with a space would make URI throw
    val totalBytes = files.map { f =>
      val hp = new org.apache.hadoop.fs.Path(f)
      hp.getFileSystem(conf).getFileStatus(hp).getLen
    }.sum
    val n = math.max(1, math.ceil(totalBytes.toDouble / targetBytes).toInt)
    val out =
      if (clusterBy.isEmpty) df.repartition(n)
      else df.repartitionByRange(n, clusterBy: _*)
        .sortWithinPartitions(clusterBy: _*)
    out.write.mode("overwrite").parquet(destPath)
    (files.length, spark.read.parquet(destPath).inputFiles.length)
  }

  /** ATOMIC compaction for a [[SnapshotCommit]]-managed table: rewrite
    * the latest committed snapshot into `ceil(bytes/targetBytes)`
    * files and publish the result as the NEXT version through the
    * manifest protocol — the "production wraps it in a commit
    * protocol" form [[compact]]'s scaladoc promises. Readers keep the
    * old version until the manifest rename; a crash mid-rewrite is
    * invisible; the superseded files leave at the next
    * `SnapshotCommit.vacuum`. The publish is COMPARE-AND-SWAP
    * (`replaceExisting = false`): if a concurrent writer committed
    * `version + 1` between our `latest()` read and the publish, this
    * throws ConcurrentModificationException instead of silently
    * clobbering that snapshot — rerun the compaction. Returns
    * (filesBefore, filesAfter, newVersion), or None when the table has
    * no committed snapshot. */
  def compactCommitted(spark: org.apache.spark.sql.SparkSession, root: String,
      targetBytes: Long,
      clusterBy: Seq[Column] = Nil): Option[(Int, Int, Long)] = {
    require(targetBytes > 0, s"targetBytes must be positive, got $targetBytes")
    SnapshotCommit.latest(spark, root).map { case (version, df) =>
      val files = df.inputFiles
      val conf = spark.sessionState.newHadoopConf()
      val totalBytes = files.map { f =>
        val hp = new org.apache.hadoop.fs.Path(f) // not URI: spaces (see compact)
        hp.getFileSystem(conf).getFileStatus(hp).getLen
      }.sum
      val n = math.max(1, math.ceil(totalBytes.toDouble / targetBytes).toInt)
      val out =
        if (clusterBy.isEmpty) df.repartition(n)
        else df.repartitionByRange(n, clusterBy: _*)
          .sortWithinPartitions(clusterBy: _*)
      SnapshotCommit.write(out, root, version + 1, replaceExisting = false)
      val after = SnapshotCommit.read(spark, root, version + 1).inputFiles.length
      (files.length, after, version + 1)
    }
  }
}
