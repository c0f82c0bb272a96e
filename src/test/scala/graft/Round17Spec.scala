package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators._

/** Round-17 hardening pins: the write-once meta's rename race, the
  * ModelCache fingerprint's mtime-granularity hole, and the line-df
  * store's legacy-layout migration path. */
class Round17Spec extends AnyFunSuite {
  lazy val spark = Sessions.local(4)

  private def tmpDir(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  test("commitIntMeta: a racing second writer with a different value " +
      "fails fast instead of silently overwriting the winner's pin") {
    val root = tmpDir("graft_meta_race")
    // writer A committed; writer B lost the exists() check race and
    // goes straight to the staged-rename path — on a POSIX filesystem
    // FileSystem.rename would OVERWRITE A's pin here, and B's rows
    // would later be validated against B's value while A's rows sit
    // beside them. The FileContext commit refuses the overwrite and B
    // validates against A's committed value.
    BatchStore.ensureIntMeta(spark, root, "_dim", "dim", 64)
    val e = intercept[IllegalArgumentException] {
      BatchStore.commitIntMeta(spark, root, "_dim", "dim", 128)
    }
    assert(e.getMessage.contains("dim=64"))
    assert(BatchStore.readIntMeta(spark, root, "_dim", "dim") == 64)
    // same value: the race loser validates clean (idempotent retry)
    BatchStore.commitIntMeta(spark, root, "_dim", "dim", 64)
    // and no staging litter survives either path
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sessionState.newHadoopConf())
    assert(!fs.listStatus(new org.apache.hadoop.fs.Path(root))
      .exists(_.getPath.getName.startsWith("._dim-")))
  }

  test("ModelCache: delete-and-recreate of a batch id with the dir " +
      "mtime pinned back still invalidates (file-level fingerprint)") {
    import spark.implicits._
    val root = tmpDir("graft_mc_recreate")
    BatchStore.append(Seq((1L, "a")).toDF("id", "v"), root, 1L)
    val mc = new ModelCache
    var computes = 0
    def serve() = mc.cached(spark, root, "t") {
      computes += 1; spark.read.parquet(root)
    }
    serve(); serve()
    assert(computes == 1, "unchanged store must serve from the cache")
    // recreate batch=1 with DIFFERENT content, then pin the dir mtime
    // back to the original value — the dir-(name, mtime) identity
    // alone would serve the stale frame (the object-store /
    // coarse-mtime scenario); the content summary must not.
    val p = new org.apache.hadoop.fs.Path(root, "batch=1")
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    val dirM = fs.getFileStatus(p).getModificationTime
    fs.delete(p, true)
    BatchStore.append(Seq((1L, "a"), (2L, "bb")).toDF("id", "v"), root, 1L)
    fs.setTimes(p, dirM, -1)
    assert(fs.getFileStatus(p).getModificationTime == dirM,
      "test harness: dir mtime must be pinned back for the scenario")
    serve()
    assert(computes == 2, "recreated batch content must invalidate")
    mc.releaseAll()
  }

  test("migrateLineDfStoreToBuckets: legacy flat store serves " +
      "identically after migration and accepts appends again") {
    import spark.implicits._
    val root = tmpDir("graft_linedf_legacy")
    val docs1 = Seq(
      (1L, "d1", "nav\nalpha"), (2L, "d1", "nav\nbeta"),
      (3L, "d1", "nav\ngamma"), (4L, "d2", "foot\ndelta"),
      (5L, "d2", "foot\nepsilon")).toDF("id", "domain", "text")
    val slice = Seq(
      (6L, "d1", "nav\nzeta"), (7L, "d2", "foot\neta"))
      .toDF("id", "domain", "text")
    // the pre-round-16 layout: flat count batches, no _dbuckets meta
    BatchStore.append(
      Boilerplate.lineDfCounts(docs1, "id", "domain", "text"), root, 1L)
    // appends refuse the legacy store loudly
    val e = intercept[IllegalArgumentException] {
      Boilerplate.writeLineDfStore(slice, "id", "domain", "text", root, 2L)
    }
    assert(e.getMessage.contains("legacy"))
    def served() = Boilerplate.stripRepeatedLinesFromStore(spark, root,
        slice, "id", "domain", "text", minDf = 2L)
      .orderBy("id").collect().map(_.toSeq).toSeq
    val before = served()
    assert(before.nonEmpty)
    val folded = Boilerplate.migrateLineDfStoreToBuckets(
      spark, root, "domain", newBatchId = 2L, buckets = 4)
    assert(folded == 1)
    assert(BatchStore.readIntMetaOpt(spark, root, "_dbuckets",
      "domain-buckets").contains(4))
    assert(served() == before, "migration must not change the serve")
    // and the store is appendable again, under the bucketed layout
    // (at the MIGRATED bucket count — the write-once pin holds)
    Boilerplate.writeLineDfStore(slice, "id", "domain", "text", root, 3L,
      buckets = 4)
    val p = new org.apache.hadoop.fs.Path(root, "batch=3")
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    assert(fs.listStatus(p).exists(_.getPath.getName.startsWith("__db=")))
  }
}
