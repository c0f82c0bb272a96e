package graft

import java.nio.file.Files

import org.apache.hadoop.fs.Path
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Incremental, SnapshotCommit}
import org.apache.spark.sql.functions._

/** Crash-injection coverage for the atomic snapshot commit protocol:
  * readers must never see a partial snapshot, no matter where the
  * writer dies — mid-data-file, between files, or before the manifest
  * rename.
  */
class SnapshotCommitSpec extends AnyFunSuite {
  lazy val spark = Sessions.local(4)
  import spark.implicits._

  private def newRoot(): String =
    Files.createTempDirectory("snapcommit").toString

  private def fs(p: String) =
    new Path(p).getFileSystem(spark.sessionState.newHadoopConf())

  test("commit publishes atomically; versions/latest resolve manifests only") {
    val root = newRoot()
    assert(SnapshotCommit.versions(spark, root).isEmpty)
    assert(SnapshotCommit.latest(spark, root).isEmpty)

    SnapshotCommit.write(Seq((1L, "a"), (2L, "b")).toDF("id", "v"), root, 0L)
    assert(SnapshotCommit.versions(spark, root) == Seq(0L))
    val (v, df) = SnapshotCommit.latest(spark, root).get
    assert(v == 0L && df.count() == 2)
  }

  test("crash between data files: partial dir without manifest is invisible") {
    val root = newRoot()
    SnapshotCommit.write(Seq((1L, "a")).toDF("id", "v"), root, 0L)

    // simulate a writer killed mid-directory for v1: a data dir with
    // real parquet files but SOME missing, and no manifest
    val partial = s"$root/data/v1-deadbeef"
    Seq((10L, "x"), (11L, "y")).toDF("id", "v")
      .repartition(2).write.parquet(partial)
    val f = fs(root)
    val parts = f.listStatus(new Path(partial)).map(_.getPath)
      .filter(_.getName.startsWith("part-"))
    assert(parts.length >= 2)
    f.delete(parts.head, false) // the "between files" kill
    f.delete(new Path(partial, "_SUCCESS"), false)

    assert(SnapshotCommit.versions(spark, root) == Seq(0L),
      "a manifest-less data dir must not surface as a version")
    assert(SnapshotCommit.latest(spark, root).get._2
      .as[(Long, String)].collect().toSeq == Seq((1L, "a")))
  }

  test("crash before manifest rename: staged .tmp manifest is invisible") {
    val root = newRoot()
    SnapshotCommit.write(Seq((1L, "a")).toDF("id", "v"), root, 0L)
    Seq((10L, "x")).toDF("id", "v").write.parquet(s"$root/data/v1-0abc1234")
    val f = fs(root)
    val tmp = new Path(s"$root/_commits/.tmp-1-0abc1234")
    val out = f.create(tmp, true)
    try out.write("v1-0abc1234".getBytes("UTF-8")) finally out.close()

    assert(SnapshotCommit.versions(spark, root) == Seq(0L))
    // completing the protocol afterwards makes v1 visible
    SnapshotCommit.write(Seq((10L, "x")).toDF("id", "v"), root, 1L)
    assert(SnapshotCommit.versions(spark, root) == Seq(0L, 1L))
  }

  test("retried version republishes atomically; last writer wins") {
    val root = newRoot()
    SnapshotCommit.write(Seq((1L, "first")).toDF("id", "v"), root, 0L)
    SnapshotCommit.write(Seq((1L, "retry")).toDF("id", "v"), root, 0L)
    assert(SnapshotCommit.versions(spark, root) == Seq(0L))
    assert(SnapshotCommit.read(spark, root, 0L)
      .as[(Long, String)].collect().toSeq == Seq((1L, "retry")))
    // both attempts' data dirs exist until vacuum; readers only see the
    // manifest-referenced one
    assert(fs(root).listStatus(new Path(root, "data")).length == 2)
  }

  test("vacuum keeps the newest versions readable, sweeps the rest") {
    val root = newRoot()
    (0L to 3L).foreach(v =>
      SnapshotCommit.write(Seq((v, s"v$v")).toDF("id", "v"), root, v))
    // an orphan from a crashed writer, old enough to sweep
    Seq((99L, "junk")).toDF("id", "v").write.parquet(s"$root/data/v9-feedbeef")

    SnapshotCommit.vacuum(spark, root, keepLast = 2, orphanGraceMs = 0L)
    assert(SnapshotCommit.versions(spark, root) == Seq(2L, 3L))
    assert(SnapshotCommit.read(spark, root, 3L)
      .as[(Long, String)].collect().toSeq == Seq((3L, "v3")))
    val dirs = fs(root).listStatus(new Path(root, "data")).map(_.getPath.getName)
    assert(dirs.length == 2 && dirs.forall(d => d.startsWith("v2-") || d.startsWith("v3-")))
  }

  test("vacuum grace period protects an in-flight writer's dir") {
    val root = newRoot()
    SnapshotCommit.write(Seq((1L, "a")).toDF("id", "v"), root, 0L)
    Seq((2L, "inflight")).toDF("id", "v").write.parquet(s"$root/data/v1-12ab34cd")
    SnapshotCommit.vacuum(spark, root, keepLast = 1) // default 1h grace
    val dirs = fs(root).listStatus(new Path(root, "data")).map(_.getPath.getName)
    assert(dirs.exists(_ == "v1-12ab34cd"), "fresh orphan must survive vacuum")
  }

  test("compactCommitted rewrites the snapshot atomically as the next version") {
    import graft.operators.Layout
    val root = newRoot()
    assert(Layout.compactCommitted(spark, root, 1L << 20).isEmpty)

    // a fragmented first version: 8 small files
    SnapshotCommit.write(
      spark.range(10000L).toDF("id").repartition(8), root, 0L)
    val before = SnapshotCommit.read(spark, root, 0L).inputFiles.length
    assert(before == 8)

    val Some((b, a, v)) = Layout.compactCommitted(spark, root, 1L << 20)
    assert(b == 8 && a < b && v == 1L)
    // same rows, old version still readable until vacuum
    assert(SnapshotCommit.read(spark, root, 1L).count() == 10000L)
    assert(SnapshotCommit.read(spark, root, 0L).count() == 10000L)
    SnapshotCommit.vacuum(spark, root, keepLast = 1, orphanGraceMs = 0L)
    assert(SnapshotCommit.versions(spark, root) == Seq(1L))
    assert(SnapshotCommit.read(spark, root, 1L).count() == 10000L)
  }

  test("CAS publish refuses to clobber a concurrently committed version") {
    val root = newRoot()
    SnapshotCommit.write(Seq((1L, "a")).toDF("id", "v"), root, 0L)
    // a concurrent writer lands version 1 first
    SnapshotCommit.write(Seq((2L, "stream")).toDF("id", "v"), root, 1L)
    intercept[java.util.ConcurrentModificationException] {
      SnapshotCommit.write(Seq((3L, "compactor")).toDF("id", "v"), root, 1L,
        replaceExisting = false)
    }
    // the concurrent writer's snapshot survives untouched
    assert(SnapshotCommit.read(spark, root, 1L)
      .as[(Long, String)].collect().toSeq == Seq((2L, "stream")))
  }

  test("ScdUpsert refuses unmigrated legacy state, migrateLegacy converts it") {
    import graft.streaming.ScdUpsert
    val root = newRoot()
    // fabricate the pre-manifest layout: <root>/v3 with _SUCCESS
    Seq((1L, "legacy")).toDF("id", "v").write.parquet(s"$root/v3")
    assert(fs(root).exists(new Path(s"$root/v3/_SUCCESS")))

    val ex = intercept[IllegalStateException] {
      ScdUpsert.latestVersion(spark, root)
    }
    assert(ex.getMessage.contains("migrateLegacy"))

    assert(ScdUpsert.migrateLegacy(spark, root) == 1)
    assert(ScdUpsert.migrateLegacy(spark, root) == 0) // idempotent
    val resolved = ScdUpsert.latestVersion(spark, root)
    assert(resolved.isDefined)
    assert(spark.read.parquet(resolved.get)
      .as[(Long, String)].collect().toSeq == Seq((1L, "legacy")))
    assert(SnapshotCommit.versions(spark, root) == Seq(3L))
  }

  test("randomized crash points: readers only ever see complete committed snapshots") {
    val rnd = new scala.util.Random(7)
    for (trial <- 1 to 6) {
      val root = newRoot()
      SnapshotCommit.write(Seq((0L, s"base$trial")).toDF("id", "v"), root, 0L)
      val f = fs(root)

      // a would-be v1 writer crashes at a RANDOM point in the protocol:
      // 0 = before any data file, 1 = mid-directory (a part file gone),
      // 2 = all data written but no manifest, 3 = manifest staged (.tmp)
      val crashAt = rnd.nextInt(4)
      val dataDir = s"$root/data/v1-0bad${trial}0"
      if (crashAt >= 1) {
        Seq((1L, "x"), (2L, "y")).toDF("id", "v")
          .repartition(2).write.parquet(dataDir)
        if (crashAt == 1) {
          val parts = f.listStatus(new Path(dataDir)).map(_.getPath)
            .filter(_.getName.startsWith("part-"))
          f.delete(parts(rnd.nextInt(parts.length)), false)
        }
        if (crashAt == 3) {
          val tmp = new Path(s"$root/_commits/.tmp-1-0bad${trial}0")
          val out = f.create(tmp, true)
          try out.write(s"v1-0bad${trial}0".getBytes("UTF-8")) finally out.close()
        }
      }

      // invariant: the crash is invisible — v0 is the only version and
      // reads back complete, regardless of where the writer died
      assert(SnapshotCommit.versions(spark, root) == Seq(0L),
        s"trial $trial crashAt $crashAt leaked a partial version")
      assert(SnapshotCommit.latest(spark, root).get._2
        .as[(Long, String)].collect().toSeq == Seq((0L, s"base$trial")))

      // recovery: a retry commits cleanly over the debris, and vacuum
      // sweeps the debris without touching the committed snapshots
      SnapshotCommit.write(Seq((1L, "retry")).toDF("id", "v"), root, 1L)
      assert(SnapshotCommit.versions(spark, root) == Seq(0L, 1L))
      SnapshotCommit.vacuum(spark, root, keepLast = 2, orphanGraceMs = 0L)
      assert(SnapshotCommit.read(spark, root, 1L)
        .as[(Long, String)].collect().toSeq == Seq((1L, "retry")))
      val dirs = f.listStatus(new Path(root, "data")).map(_.getPath.getName)
      assert(dirs.length == 2, s"debris survived vacuum: ${dirs.mkString(",")}")
    }
  }

  // ------------------------------------------------- put-if-absent

  import graft.operators.SnapshotCommit.PutIfAbsentCommit

  test("put-mode commit publishes via immutable entries; interops with rename mode") {
    val root = newRoot()
    SnapshotCommit.write(Seq((1L, "a")).toDF("id", "v"), root, 0L) // rename mode
    SnapshotCommit.write(Seq((2L, "b")).toDF("id", "v"), root, 1L,
      mode = PutIfAbsentCommit)
    assert(SnapshotCommit.versions(spark, root) == Seq(0L, 1L))
    assert(SnapshotCommit.read(spark, root, 1L)
      .as[(Long, String)].collect().toSeq == Seq((2L, "b")))
    // the put-mode manifest is a DETERMINISTIC numbered entry (the
    // writer token lives only in the content): create-if-absent on
    // the exact slot path is what makes racing writers collide
    val names = fs(root).listStatus(new Path(root, "_commits"))
      .map(_.getPath.getName).toSeq
    assert(names.contains("0") && names.contains("1.0"))
  }

  test("put-mode retry appends the next seq; the latest valid entry wins") {
    val root = newRoot()
    SnapshotCommit.write(Seq((1L, "first")).toDF("id", "v"), root, 0L,
      mode = PutIfAbsentCommit)
    SnapshotCommit.write(Seq((1L, "retry")).toDF("id", "v"), root, 0L,
      mode = PutIfAbsentCommit)
    val names = fs(root).listStatus(new Path(root, "_commits"))
      .map(_.getPath.getName).toSeq.sorted
    assert(names.contains("0.0") && names.contains("0.1"),
      s"retry must supersede, never delete: $names")
    assert(SnapshotCommit.read(spark, root, 0L)
      .as[(Long, String)].collect().toSeq == Seq((1L, "retry")))
  }

  test("put-mode crash: a half-written manifest entry is skipped, never served") {
    val root = newRoot()
    SnapshotCommit.write(Seq((1L, "good")).toDF("id", "v"), root, 0L,
      mode = PutIfAbsentCommit)
    val f = fs(root)
    // crash simulation (local FS create is not content-atomic): a
    // writer died after creating its seq-1 entry but before the
    // content landed — the entry exists but is EMPTY
    val half = new Path(s"$root/_commits/0.1-deadbeef")
    f.create(half, true).close()
    assert(SnapshotCommit.read(spark, root, 0L)
      .as[(Long, String)].collect().toSeq == Seq((1L, "good")),
      "reader must fall back to the highest VALID entry")

    // a version whose ONLY entry is half-written is not committed at all
    val half2 = new Path(s"$root/_commits/1.0-deadbeef")
    f.create(half2, true).close()
    assert(SnapshotCommit.versions(spark, root) == Seq(0L),
      "an invalid entry must not surface as a committed version")
    assert(SnapshotCommit.latest(spark, root).get._1 == 0L)

    // recovery: completing the protocol supersedes the debris
    SnapshotCommit.write(Seq((9L, "v1")).toDF("id", "v"), root, 1L,
      mode = PutIfAbsentCommit)
    assert(SnapshotCommit.versions(spark, root) == Seq(0L, 1L))
    assert(SnapshotCommit.read(spark, root, 1L)
      .as[(Long, String)].collect().toSeq == Seq((9L, "v1")))
  }

  test("put-mode CAS refuses an already-committed version") {
    val root = newRoot()
    SnapshotCommit.write(Seq((1L, "a")).toDF("id", "v"), root, 0L,
      mode = PutIfAbsentCommit)
    intercept[java.util.ConcurrentModificationException] {
      SnapshotCommit.write(Seq((2L, "b")).toDF("id", "v"), root, 0L,
        replaceExisting = false, mode = PutIfAbsentCommit)
    }
    assert(SnapshotCommit.read(spark, root, 0L)
      .as[(Long, String)].collect().toSeq == Seq((1L, "a")))
  }

  test("vacuum sweeps put-mode entries of dropped versions and stale .tmp files") {
    val root = newRoot()
    (0L to 2L).foreach(v => SnapshotCommit.write(
      Seq((v, s"v$v")).toDF("id", "v"), root, v, mode = PutIfAbsentCommit))
    val f = fs(root)
    // a crashed rename-mode writer's staged manifest, old enough to sweep
    val tmp = new Path(s"$root/_commits/.tmp-9-0abc1234")
    val out = f.create(tmp, true)
    try out.write("v9-0abc1234".getBytes("UTF-8")) finally out.close()

    SnapshotCommit.vacuum(spark, root, keepLast = 2, orphanGraceMs = 0L)
    assert(SnapshotCommit.versions(spark, root) == Seq(1L, 2L))
    val names = f.listStatus(new Path(root, "_commits")).map(_.getPath.getName)
    assert(!names.exists(_.startsWith("0.")), "dropped version's entries remain")
    assert(!names.exists(_.startsWith(".tmp-")), "stale .tmp manifest remains")
    // put-committed survivors keep their data dirs (orphan re-check
    // resolves put-mode manifests too)
    assert(SnapshotCommit.read(spark, root, 2L)
      .as[(Long, String)].collect().toSeq == Seq((2L, "v2")))
  }

  test("RenameCommit refuses a copy+delete object-store scheme; put mode works there") {
    val hconf = spark.sparkContext.hadoopConfiguration
    hconf.set("fs.s3a.impl", classOf[FakeS3FileSystem].getName)
    hconf.unset("fs.s3a.create.conditional")
    val root = s"s3a:${newRoot()}"
    val ex = intercept[IllegalArgumentException] {
      SnapshotCommit.write(Seq((1L, "a")).toDF("id", "v"), root, 0L)
    }
    assert(ex.getMessage.contains("PutIfAbsentCommit"))
    // the refusal fires BEFORE any data lands
    assert(!fs(root).exists(new Path(root, "data")))

    // stock S3A create(overwrite=false) is a client-side existence
    // check, not If-None-Match: put mode must REFUSE until the store's
    // conditional create is enabled (same contract as the rename
    // refusal — never publish without the claimed atomicity)
    val ex2 = intercept[IllegalArgumentException] {
      SnapshotCommit.write(Seq((1L, "a")).toDF("id", "v"), root, 0L,
        mode = PutIfAbsentCommit)
    }
    assert(ex2.getMessage.contains("fs.s3a.create.conditional"))
    assert(!fs(root).exists(new Path(root, "data")))

    hconf.setBoolean("fs.s3a.create.conditional", true)
    SnapshotCommit.write(Seq((1L, "a")).toDF("id", "v"), root, 0L,
      mode = PutIfAbsentCommit)
    assert(SnapshotCommit.versions(spark, root) == Seq(0L))
    assert(SnapshotCommit.read(spark, root, 0L)
      .as[(Long, String)].collect().toSeq == Seq((1L, "a")))
  }

  test("AutoCommit default: an s3a root publishes atomically with no explicit mode") {
    val hconf = spark.sparkContext.hadoopConfiguration
    hconf.set("fs.s3a.impl", classOf[FakeS3FileSystem].getName)
    hconf.setBoolean("fs.s3a.create.conditional", true)
    val root = s"s3a:${newRoot()}"
    SnapshotCommit.write(Seq((1L, "auto")).toDF("id", "v"), root, 0L) // no mode
    // dispatched to put-mode entries, not a plain (rename) manifest
    val names = fs(root).listStatus(new Path(root, "_commits"))
      .map(_.getPath.getName).toSeq
    assert(names.contains("0.0") && !names.contains("0"), names.mkString(","))
    assert(SnapshotCommit.read(spark, root, 0L)
      .as[(Long, String)].collect().toSeq == Seq((1L, "auto")))

    // the same default picks rename mode on a rename-atomic scheme
    val local = newRoot()
    SnapshotCommit.write(Seq((2L, "local")).toDF("id", "v"), local, 0L)
    val localNames = fs(local).listStatus(new Path(local, "_commits"))
      .map(_.getPath.getName).toSeq
    assert(localNames.contains("0") && !localNames.contains("0.0"))

    // operators inherit the dispatch (no mode argument anywhere in the
    // call chain): Incremental's committed partials on an s3a root
    val incRoot = s"s3a:${newRoot()}"
    Incremental.writePartialsCommitted(
      Seq(("a", java.sql.Date.valueOf("2024-01-01"), 1L, BigDecimal(10)))
        .toDF("k", "day", "n_rows", "sum_value"), incRoot, 0L)
    assert(SnapshotCommit.versions(spark, incRoot) == Seq(0L))
    assert(fs(incRoot).listStatus(new Path(incRoot, "_commits"))
      .map(_.getPath.getName).toSeq.contains("0.0"))
  }

  test("put-mode CAS: two writers racing the same seq slot — exactly one wins") {
    // The round-6 advisory: token'd entry names gave each racer a
    // PRIVATE path, so both creates succeeded and both writers
    // believed they committed. Deterministic slot names make the
    // collision real. Simulate the loser's schedule: it computed
    // seq=0, then the competitor's entry landed first.
    val root = newRoot()
    val f = fs(root)
    f.mkdirs(new Path(root, "_commits"))
    // competitor claims slot 0.0 with valid content
    Seq((1L, "winner")).toDF("id", "v").write.parquet(s"$root/data/v0-aaaa1111")
    val out = f.create(new Path(s"$root/_commits/0.0"), false)
    try out.write("v0-aaaa1111".getBytes("UTF-8")) finally out.close()

    // CAS writer (replaceExisting=false) must now observe the commit
    // and refuse — not land beside it
    intercept[java.util.ConcurrentModificationException] {
      SnapshotCommit.write(Seq((2L, "loser")).toDF("id", "v"), root, 0L,
        replaceExisting = false, mode = PutIfAbsentCommit)
    }
    assert(SnapshotCommit.read(spark, root, 0L)
      .as[(Long, String)].collect().toSeq == Seq((1L, "winner")),
      "the slot winner's snapshot must be the one served")
    // and the slot is still the deterministic single entry
    val names = f.listStatus(new Path(root, "_commits")).map(_.getPath.getName)
    assert(names.count(_.startsWith("0.")) == 1, names.mkString(","))
  }

  test("rename-mode CAS sees put-mode commits (no cross-mode clobber)") {
    // Without the cross-mode check, a rename-mode CAS writer racing a
    // put-mode committer publishes a plain manifest that takes READ
    // precedence over the entries — the exact clobber CAS refuses.
    val root = newRoot()
    SnapshotCommit.write(Seq((1L, "put")).toDF("id", "v"), root, 0L,
      mode = PutIfAbsentCommit)
    intercept[java.util.ConcurrentModificationException] {
      SnapshotCommit.write(Seq((2L, "rename-cas")).toDF("id", "v"), root, 0L,
        replaceExisting = false, mode = SnapshotCommit.RenameCommit)
    }
    assert(SnapshotCommit.read(spark, root, 0L)
      .as[(Long, String)].collect().toSeq == Seq((1L, "put")))
  }

  test("put-mode retry over a rename-committed version supersedes the plain manifest") {
    // Round-6 advisory (medium): dataPath prefers the plain manifest,
    // so without the supersede a put-mode retry would be silently
    // unpublished — writer told success, readers serve the old data,
    // vacuum eventually sweeps the new dir.
    val root = newRoot()
    SnapshotCommit.write(Seq((1L, "rename")).toDF("id", "v"), root, 0L)
    SnapshotCommit.write(Seq((2L, "put-retry")).toDF("id", "v"), root, 0L,
      mode = PutIfAbsentCommit)
    assert(SnapshotCommit.read(spark, root, 0L)
      .as[(Long, String)].collect().toSeq == Seq((2L, "put-retry")),
      "the put-mode retry must actually publish")
    val names = fs(root).listStatus(new Path(root, "_commits"))
      .map(_.getPath.getName).toSeq
    assert(!names.contains("0") && names.contains("0.0"),
      s"plain manifest must be superseded: $names")
    // and vacuum keeps the served dir
    SnapshotCommit.vacuum(spark, root, keepLast = 1, orphanGraceMs = 0L)
    assert(SnapshotCommit.read(spark, root, 0L)
      .as[(Long, String)].collect().toSeq == Seq((2L, "put-retry")))
  }

  test("supersede crash window: vacuum protects BOTH referenced dirs") {
    // Crash between entry-create and plain-manifest-delete: readers
    // still serve the plain version (stale but complete), and the
    // entry's dir must NOT sweep as an orphan — the next retry
    // completes the supersede and readers flip to it.
    val root = newRoot()
    SnapshotCommit.write(Seq((1L, "rename")).toDF("id", "v"), root, 0L)
    val f = fs(root)
    // fabricate the crashed put-retry: data dir + valid entry, plain
    // manifest still in place
    Seq((2L, "crashed-retry")).toDF("id", "v")
      .write.parquet(s"$root/data/v0-bbbb2222")
    val out = f.create(new Path(s"$root/_commits/0.0"), false)
    try out.write("v0-bbbb2222".getBytes("UTF-8")) finally out.close()

    // readers: plain still wins (stale but complete)
    assert(SnapshotCommit.read(spark, root, 0L)
      .as[(Long, String)].collect().toSeq == Seq((1L, "rename")))
    SnapshotCommit.vacuum(spark, root, keepLast = 1, orphanGraceMs = 0L)
    val dirs = f.listStatus(new Path(root, "data")).map(_.getPath.getName).toSet
    assert(dirs.contains("v0-bbbb2222"),
      "entry-referenced dir must survive vacuum during the crash window")

    // recovery: the next put-mode retry completes the supersede
    SnapshotCommit.write(Seq((3L, "retry2")).toDF("id", "v"), root, 0L,
      mode = PutIfAbsentCommit)
    assert(SnapshotCommit.read(spark, root, 0L)
      .as[(Long, String)].collect().toSeq == Seq((3L, "retry2")))
  }

  test("migrateLegacy on a mixed root skips already-committed versions") {
    import graft.streaming.ScdUpsert
    val root = newRoot()
    // v3 already committed under the manifest protocol…
    SnapshotCommit.write(Seq((1L, "committed")).toDF("id", "v"), root, 3L)
    // …while a stale legacy v3 dir AND an unmigrated legacy v4 remain
    Seq((1L, "stale-legacy")).toDF("id", "v").write.parquet(s"$root/v3")
    Seq((2L, "legacy4")).toDF("id", "v").write.parquet(s"$root/v4")

    assert(ScdUpsert.migrateLegacy(spark, root) == 1, "only v4 must migrate")
    assert(SnapshotCommit.versions(spark, root) == Seq(3L, 4L))
    // committed v3 untouched; the stale legacy dir was NOT renamed into
    // data/ (it would become unmanifested vacuum bait)
    assert(SnapshotCommit.read(spark, root, 3L)
      .as[(Long, String)].collect().toSeq == Seq((1L, "committed")))
    assert(fs(root).exists(new Path(s"$root/v3")),
      "stale legacy dir must be left in place for the operator to inspect")
    assert(SnapshotCommit.read(spark, root, 4L)
      .as[(Long, String)].collect().toSeq == Seq((2L, "legacy4")))
  }

  test("writePartialsCommitted: incremental days accumulate; retry is idempotent") {
    val root = newRoot()
    def partials(day: String, k: String, n: Long) =
      Seq((k, java.sql.Date.valueOf(day), n, BigDecimal(n * 10)))
        .toDF("k", "day", "n_rows", "sum_value")

    Incremental.writePartialsCommitted(partials("2024-01-01", "a", 5L), root, 0L)
    Incremental.writePartialsCommitted(partials("2024-01-02", "a", 7L), root, 1L)
    val got = SnapshotCommit.latest(spark, root).get._2
      .orderBy(col("day")).select(col("day").cast("string"), col("n_rows"))
      .as[(String, Long)].collect().toSeq
    assert(got == Seq(("2024-01-01", 5L), ("2024-01-02", 7L)))

    // a retried day-2 run REPLACES day 2, never duplicates it
    Incremental.writePartialsCommitted(partials("2024-01-02", "a", 8L), root, 2L)
    val after = SnapshotCommit.latest(spark, root).get._2
      .orderBy(col("day")).select(col("day").cast("string"), col("n_rows"))
      .as[(String, Long)].collect().toSeq
    assert(after == Seq(("2024-01-01", 5L), ("2024-01-02", 8L)))
    // previous snapshots remain readable (time travel until vacuum)
    assert(SnapshotCommit.read(spark, root, 1L).count() == 2)
  }
}
