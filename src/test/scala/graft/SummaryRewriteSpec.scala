package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.SummaryRewrite

/** Round-13: the materialized-rollup view-matching rule — rewritten
  * plans scan the rollup (never the base), values are identical to
  * the direct aggregation, output ExprIds survive (operators above
  * the Aggregate keep resolving), and every shape the rule cannot
  * prove stays untouched.
  */
class SummaryRewriteSpec extends AnyFunSuite {
  lazy val spark = Sessions.local(4)

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private def rm(root: String): Unit =
    new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sessionState.newHadoopConf())
      .delete(new org.apache.hadoop.fs.Path(root), true)

  /** Root paths of every file scan in the optimized plan. */
  private def scanPaths(df: DataFrame): Seq[String] =
    df.queryExecution.optimizedPlan.collect {
      case r: LogicalRelation => r.relation match {
        case fs: HadoopFsRelation => fs.location.rootPaths.map(_.toString)
        case _ => Seq.empty
      }
    }.flatten

  private def scansOnly(df: DataFrame, path: String): Boolean = {
    val ps = scanPaths(df)
    ps.nonEmpty && ps.forall(_.contains(
      new org.apache.hadoop.fs.Path(path).getName))
  }

  private def withFixture(test: (String, String) => Unit): Unit = {
    import spark.implicits._
    val base = tmp("graft_sr_base")
    val summary = tmp("graft_sr_sum")
    try {
      (1L to 200L).map { i =>
        (i, s"k${i % 5}", s"g${i % 3}", i * 2, if (i % 7 == 0) None else Some(i.toDouble))
      }.toDF("id", "key_a", "key_b", "m_long", "m_opt")
        .write.mode("overwrite").parquet(base)
      SummaryRewrite.buildAndRegister(spark, base,
        keys = Seq("key_a", "key_b"), measures = Seq("m_long"), summary)
      test(base, summary)
    } finally {
      SummaryRewrite.deregister(base)
      rm(base); rm(summary)
    }
  }

  test("subset grouping + key filter rewrites to the rollup scan with identical values") {
    withFixture { (base, summary) =>
      def query(p: String) = spark.read.parquet(p)
        .filter(col("key_b") =!= "g0")
        .groupBy(col("key_a"))
        .agg(count(lit(1)).as("n"), sum(col("m_long")).as("s"),
          min(col("m_long")).as("mn"), max(col("m_long")).as("mx"))
        .orderBy(col("key_a"))
      val rewritten = query(base)
      assert(scansOnly(rewritten, summary),
        s"expected only the rollup scan, got ${scanPaths(rewritten)}")
      // values: compare against the same query with the rule disabled
      spark.conf.set("spark.graft.summaryRewrite", "false")
      val direct = try query(base).collect().toSeq
        finally spark.conf.unset("spark.graft.summaryRewrite")
      assert(rewritten.collect().toSeq == direct,
        "rewritten plan must be value-identical to the base aggregation")
    }
  }

  test("grouping by BOTH keys and the global aggregate rewrite too; empty-match count is 0, not null") {
    withFixture { (base, summary) =>
      val both = spark.read.parquet(base)
        .groupBy(col("key_a"), col("key_b"))
        .agg(sum(col("m_long")).as("s"))
      assert(scansOnly(both, summary))
      assert(both.agg(sum(col("s"))).head.getLong(0) == (1L to 200L).map(_ * 2).sum)
      val global = spark.read.parquet(base)
        .filter(col("key_a") === "nope")
        .agg(count(lit(1)).as("n"), sum(col("m_long")).as("s"))
      assert(scansOnly(global, summary))
      val row = global.head
      assert(row.getLong(0) == 0L && row.isNullAt(1),
        s"empty global agg must yield (0, null), got $row")
    }
  }

  test("shapes the rule cannot prove stay on the base scan") {
    withFixture { (base, summary) =>
      val df = spark.read.parquet(base)
      // nullable-column count (count(m_opt) skips nulls — not count(*))
      val c = df.groupBy(col("key_a")).agg(count(col("m_opt")).as("n"))
      // avg (not decomposable from these partials)
      val a = df.groupBy(col("key_a")).agg(avg(col("m_long")).as("a"))
      // filter on a non-key column
      val f = df.filter(col("id") > 100).groupBy(col("key_a"))
        .agg(sum(col("m_long")).as("s"))
      // grouping on a non-key column
      val g = df.groupBy(col("id")).agg(sum(col("m_long")).as("s"))
      // count-distinct
      val d = df.groupBy(col("key_a")).agg(countDistinct(col("m_long")).as("n"))
      Seq(("count(nullable)", c), ("avg", a), ("non-key filter", f),
        ("non-key grouping", g), ("count-distinct", d)).foreach {
        case (name, q) =>
          assert(!scansOnly(q, summary),
            s"$name must NOT rewrite, got ${scanPaths(q)}")
      }
      // and the kill-switch disables even a provable shape
      spark.conf.set("spark.graft.summaryRewrite", "false")
      try {
        val killed = df.groupBy(col("key_a")).agg(sum(col("m_long")).as("s"))
        assert(!scansOnly(killed, summary), "kill-switch must disable the rule")
      } finally spark.conf.unset("spark.graft.summaryRewrite")
    }
  }

  test("multiple rollups: each query picks the smallest CAPABLE one") {
    import spark.implicits._
    val base = tmp("graft_sr_multi_base")
    val coarse = tmp("graft_sr_coarse")
    val fine = tmp("graft_sr_fine")
    try {
      (1L to 100L).map(i => (i, s"k${i % 4}", s"g${i % 3}", i))
        .toDF("id", "key_a", "key_b", "m")
        .write.mode("overwrite").parquet(base)
      SummaryRewrite.buildAndRegister(spark, base,
        keys = Seq("key_a", "key_b"), measures = Seq("m"), fine)
      SummaryRewrite.buildAndRegister(spark, base,
        keys = Seq("key_a"), measures = Seq("m"), coarse)
      val df = spark.read.parquet(base)
      // answerable at coarse granularity -> the 1-key rollup wins
      val byA = df.groupBy(col("key_a")).agg(sum(col("m")).as("s"))
      assert(scansOnly(byA, coarse),
        s"expected the coarse rollup, got ${scanPaths(byA)}")
      // the key_b filter needs the fine rollup
      val filtered = df.filter(col("key_b") === "g1")
        .groupBy(col("key_a")).agg(sum(col("m")).as("s"))
      assert(scansOnly(filtered, fine),
        s"expected the fine rollup, got ${scanPaths(filtered)}")
      // values identical either way
      spark.conf.set("spark.graft.summaryRewrite", "false")
      val directA = try byA.orderBy(col("key_a")).collect().toSeq
        finally spark.conf.unset("spark.graft.summaryRewrite")
      assert(byA.orderBy(col("key_a")).collect().toSeq == directA)
    } finally {
      SummaryRewrite.deregister(base)
      Seq(base, coarse, fine).foreach(rm)
    }
  }

  test("incrementally-appended rollup partials re-aggregate correctly through the rewrite") {
    import spark.implicits._
    val base = tmp("graft_sr_inc_base")
    val root = tmp("graft_sr_inc_roll")
    try {
      (1L to 120L).map(i => (i, s"k${i % 3}", i * 3))
        .toDF("id", "key_a", "m")
        .write.mode("overwrite").parquet(base)
      val df = spark.read.parquet(base)
      // three slices — every group gets THREE partial rows
      Seq(0L, 1L, 2L).foreach(r =>
        SummaryRewrite.appendRollupSlice(df.filter(col("id") % 3 === r),
          Seq("key_a"), Seq("m"), root, batchId = r + 1))
      SummaryRewrite.register(spark, base, root, Seq("key_a"), Seq("m"))
      val agg = spark.read.parquet(base)
        .groupBy(col("key_a"))
        .agg(count(lit(1)).as("n"), sum(col("m")).as("s"),
          min(col("m")).as("mn"), max(col("m")).as("mx"))
        .orderBy(col("key_a"))
      assert(scansOnly(agg, root),
        s"expected the incremental rollup scan, got ${scanPaths(agg)}")
      val got = agg.as[(String, Long, Long, Long, Long)].collect().toSeq
      val expect = (1L to 120L).groupBy(i => s"k${i % 3}").toSeq.sortBy(_._1)
        .map { case (k, is) =>
          (k, is.size.toLong, is.map(_ * 3).sum, is.min * 3, is.max * 3) }
      assert(got == expect, s"\n got    $got\n expect $expect")
    } finally {
      SummaryRewrite.deregister(base)
      Seq(base, root).foreach(rm)
    }
  }

  test("a non-deterministic filter over key columns disqualifies the rewrite") {
    withFixture { (base, summary) =>
      // rand() references no non-key column, but moved onto the
      // rollup it would sample pre-aggregated GROUP rows, not base
      // rows — the rule must leave the plan on the base scan. (An
      // out-of-range comparison like rand() < 2.0 is FOLDED AWAY by
      // the optimizer before the rule runs; the in-range one stays.)
      val q = spark.read.parquet(base)
        .filter(rand(7) < 0.5)
        .groupBy(col("key_a")).agg(sum(col("m_long")).as("s"))
      assert(!scansOnly(q, summary),
        s"non-deterministic filter must NOT rewrite: ${scanPaths(q)}")
    }
  }

  test("decimal sum: the rewritten aggregate keeps the original result type") {
    import spark.implicits._
    val base = tmp("graft_sr_dec_base")
    val summary = tmp("graft_sr_dec_sum")
    try {
      (1L to 50L).map(i => (s"k${i % 3}", BigDecimal(i).setScale(2)))
        .toDF("key_a", "m_dec")
        .select(col("key_a"), col("m_dec").cast("decimal(12,2)").as("m_dec"))
        .write.mode("overwrite").parquet(base)
      SummaryRewrite.buildAndRegister(spark, base,
        keys = Seq("key_a"), measures = Seq("m_dec"), summary)
      val q = spark.read.parquet(base)
        .groupBy(col("key_a")).agg(sum(col("m_dec")).as("s"))
      assert(scansOnly(q, summary), s"expected rewrite: ${scanPaths(q)}")
      // base sum(decimal(12,2)) = decimal(22,2); re-summing the
      // rollup's decimal(22,2) partial would widen to (32,2) — the
      // preserved ExprId would then resolve at the WRONG type
      assert(q.schema("s").dataType ==
        org.apache.spark.sql.types.DecimalType(22, 2),
        s"rewritten sum must keep decimal(22,2), got ${q.schema("s").dataType}")
      val got = q.orderBy(col("key_a")).as[(String, BigDecimal)].collect().toSeq
      val expect = (1L to 50L).groupBy(i => s"k${i % 3}").toSeq.sortBy(_._1)
        .map { case (k, is) => (k, BigDecimal(is.sum).setScale(2)) }
      assert(got == expect, s"\n got    $got\n expect $expect")
    } finally {
      SummaryRewrite.deregister(base)
      Seq(base, summary).foreach(rm)
    }
  }

  test("a partial appended AFTER registration is served fresh (appendRollupSlice refreshes)") {
    import spark.implicits._
    val base = tmp("graft_sr_fresh_base")
    val root = tmp("graft_sr_fresh_roll")
    try {
      (1L to 60L).map(i => (i, s"k${i % 3}", i * 5))
        .toDF("id", "key_a", "m")
        .write.mode("overwrite").parquet(base)
      val df = spark.read.parquet(base)
      SummaryRewrite.appendRollupSlice(df.filter(col("id") <= 30),
        Seq("key_a"), Seq("m"), root, batchId = 1L)
      SummaryRewrite.register(spark, base, root, Seq("key_a"), Seq("m"))
      // maintenance AFTER registration — the old listing would miss it
      SummaryRewrite.appendRollupSlice(df.filter(col("id") > 30),
        Seq("key_a"), Seq("m"), root, batchId = 2L)
      val q = spark.read.parquet(base)
        .groupBy(col("key_a")).agg(sum(col("m")).as("s"))
        .orderBy(col("key_a"))
      assert(scansOnly(q, root), s"expected rewrite: ${scanPaths(q)}")
      val got = q.as[(String, Long)].collect().toSeq
      val expect = (1L to 60L).groupBy(i => s"k${i % 3}").toSeq.sortBy(_._1)
        .map { case (k, is) => (k, is.map(_ * 5).sum) }
      assert(got == expect,
        s"post-registration append must be visible:\n got $got\n expect $expect")
    } finally {
      SummaryRewrite.deregister(base)
      Seq(base, root).foreach(rm)
    }
  }

  test("rollupSink: epoch replay is a no-op; an epoch landing AFTER registration is served fresh") {
    import spark.implicits._
    val base = tmp("graft_sr_sink_base")
    val root = tmp("graft_sr_sink_roll")
    try {
      (1L to 40L).map(i => (i, s"k${i % 2}", i * 7))
        .toDF("id", "key_a", "m")
        .write.mode("overwrite").parquet(base)
      val df = spark.read.parquet(base)
      val sink = SummaryRewrite.rollupSink(Seq("key_a"), Seq("m"), root)
      sink(df.filter(col("id") <= 20), 0L)
      def stored() = spark.read.parquet(root)
        .orderBy(col("batch"), col("key_a")).collect().toSeq
      val s0 = stored()
      sink(df.filter(col("id") <= 20), 0L) // replay
      assert(stored() == s0, "epoch replay must be a no-op")
      SummaryRewrite.register(spark, base, root, Seq("key_a"), Seq("m"))
      // the NEXT epoch lands after registration — the sink's
      // per-epoch refresh must make it visible with no re-register
      sink(df.filter(col("id") > 20), 1L)
      val q = spark.read.parquet(base)
        .groupBy(col("key_a")).agg(sum(col("m")).as("s"))
        .orderBy(col("key_a"))
      assert(scansOnly(q, root), s"expected rewrite: ${scanPaths(q)}")
      val got = q.as[(String, Long)].collect().toSeq
      val expect = (1L to 40L).groupBy(i => s"k${i % 2}").toSeq.sortBy(_._1)
        .map { case (k, is) => (k, is.map(_ * 7).sum) }
      assert(got == expect,
        s"post-registration epoch must be served fresh:\n got $got\n expect $expect")
    } finally {
      SummaryRewrite.deregister(base)
      Seq(base, root).foreach(rm)
    }
  }

  test("registry keys keep remote scheme+authority: an s3a registration never serves a local base at the same path") {
    withFixture { (base, summary) =>
      SummaryRewrite.deregister(base)
      // same PATH, different filesystem — must not collide
      SummaryRewrite.register(spark, s"s3a://bucket-a$base", summary,
        keys = Seq("key_a", "key_b"), measures = Seq("m_long"))
      try {
        val q = spark.read.parquet(base)
          .groupBy(col("key_a")).agg(sum(col("m_long")).as("s"))
        assert(!scansOnly(q, summary),
          s"s3a registration served a local base: ${scanPaths(q)}")
      } finally SummaryRewrite.deregister(s"s3a://bucket-a$base")
      // re-register locally so withFixture's deregister stays a no-op
      SummaryRewrite.register(spark, base, summary,
        keys = Seq("key_a", "key_b"), measures = Seq("m_long"))
    }
  }

  test("HAVING above the rewritten aggregate keeps resolving and filters the rewritten values") {
    withFixture { (base, summary) =>
      import spark.implicits._
      // HAVING is a Filter ABOVE the Aggregate — untouched by the
      // rule; it must resolve against the preserved output ExprIds
      // and see the rollup-served values
      val q = spark.read.parquet(base)
        .groupBy(col("key_a")).agg(sum(col("m_long")).as("s"))
        .filter(col("s") > 15000)
        .orderBy(col("key_a"))
      assert(scansOnly(q, summary), s"expected rewrite: ${scanPaths(q)}")
      val expect = (1L to 200L).groupBy(i => s"k${i % 5}").toSeq
        .map { case (k, is) => (k, is.map(_ * 2).sum) }
        .filter(_._2 > 15000).sortBy(_._1)
      assert(q.as[(String, Long)].collect().toSeq == expect)
    }
  }

  test("output ExprIds survive: joins and sorts above the rewritten aggregate keep resolving") {
    withFixture { (base, summary) =>
      import spark.implicits._
      val agg = spark.read.parquet(base)
        .groupBy(col("key_a")).agg(sum(col("m_long")).as("s"))
      val dim = Seq(("k0", "zero"), ("k1", "one")).toDF("key_a", "label")
      val joined = agg.join(dim, Seq("key_a")).orderBy(desc("s"), col("key_a"))
      assert(scansOnly(joined.select(col("key_a"), col("s")), summary) ||
        scanPaths(joined).exists(_.contains(
          new org.apache.hadoop.fs.Path(summary).getName)),
        s"rollup scan must survive under the join: ${scanPaths(joined)}")
      val got = joined.select(col("key_a"), col("s"), col("label"))
        .as[(String, Long, String)].collect().toSeq
      val expect = (1L to 200L).groupBy(i => s"k${i % 5}")
        .view.mapValues(_.map(_ * 2).sum).toMap
      assert(got == Seq(("k0", expect("k0"), "zero"), ("k1", expect("k1"), "one")))
    }
  }
}
