package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Layout, TextFunctions}

/** The SparkSessionExtensions function surface and the Z-order layout
  * operator.
  */
class ExtensionsLayoutSpec extends AnyFunSuite {
  lazy val spark = Sessions.local(4)
  import spark.implicits._

  // --------------------------------------------------- extensions

  test("injected graft_hash60 equals the DSL hash60 kernel") {
    val df = Seq("a", "b", "graft", "").toDF("s")
    df.createOrReplaceTempView("ext_t")
    val sql = spark.sql("SELECT s, graft_hash60(s) AS h FROM ext_t")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val dsl = df.select(col("s"), TextFunctions.hash60(col("s")).as("h"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(sql == dsl)
  }

  test("injected graft_dot equals the DSL dot kernel on floats") {
    val df = Seq((Array(1.0f, 2.0f, 3.0f), Array(4.0f, 5.0f, 6.0f)))
      .toDF("a", "b")
    df.createOrReplaceTempView("ext_v")
    val got = spark.sql("SELECT graft_dot(a, b) AS d FROM ext_v")
      .collect().head.getDouble(0)
    assert(got == 32.0)
  }

  test("injected functions reject wrong arity at analysis time") {
    val e = intercept[Exception] { spark.sql("SELECT graft_hash60('a', 'b')") }
    assert(e.getMessage.contains("graft_hash60"))
  }

  // -------------------------------------------------------- morton

  test("morton2 interleaves bits: a at even positions, b at odd") {
    val df = Seq((3L, 1L), (0L, 0L), (255L, 0L), (0L, 255L), (170L, 85L))
      .toDF("a", "b")
    val got = df.select(Layout.morton2(col("a"), col("b"), 8).as("z"))
      .collect().map(_.getLong(0)).toSeq
    // a=0b11,b=0b01 → z = (1·1 + 1·4) + 2·1 = 7
    // a=255 → even bits of 16: 0b0101010101010101 = 21845
    // b=255 → odd bits: 43690; a=170,b=85 → 0b10..·even + ..
    def ref(a: Long, b: Long): Long =
      (0 until 8).map(i => (((a >> i) & 1) << (2 * i)) | (((b >> i) & 1) << (2 * i + 1))).sum
    assert(got == Seq(7L, 0L, 21845L, 43690L, ref(170L, 85L)))
  }

  test("z-ordered files bound BOTH dimensions; a plain sort leaves b unprunable") {
    val sf = "/root/testdata/sf0.01"
    val o = Tables.orders(spark, sf).select(
      pmod(col("o_custkey"), lit(256L)).as("a"),
      pmod(datediff(col("o_orderdate"), lit("1970-01-01")).cast("long"), lit(256L))
        .as("b"))
    val dir = java.nio.file.Files.createTempDirectory("zorder").toString

    Layout.zorderWrite(o, col("a"), col("b"), bits = 8, numFiles = 16, s"$dir/z")
    o.repartitionByRange(16, col("a")).sortWithinPartitions(col("a"))
      .write.mode("overwrite").parquet(s"$dir/plain")

    // Mean per-FILE value range of each dimension — the quantity
    // parquet min/max stats prune on. A b-only predicate can never
    // prune the a-sorted layout (every file spans the full b domain);
    // z-ordered files bound b tightly while keeping a bounded too.
    def meanRanges(path: String): (Double, Double) = {
      val r = spark.read.parquet(path)
        .withColumn("f", input_file_name())
        .groupBy(col("f"))
        .agg((max(col("a")) - min(col("a"))).as("ra"),
          (max(col("b")) - min(col("b"))).as("rb"))
        .agg(avg(col("ra")), avg(col("rb"))).collect().head
      (r.getDouble(0), r.getDouble(1))
    }
    val (zA, zB) = meanRanges(s"$dir/z")
    val (_, plainB) = meanRanges(s"$dir/plain")
    assert(zB * 2 < plainB, s"zB=$zB plainB=$plainB")   // b prunes under z-order
    assert(zA < 192, s"zA=$zA")                          // a still bounded too
  }

  test("compact rewrites a many-small-file table into few sized files, data intact") {
    val dir = java.nio.file.Files.createTempDirectory("graft_compact").toString
    // simulate an incremental writer: 40 tiny files
    val df = spark.range(0, 20000).select(
      col("id"), (col("id") % 97).as("k"), rand(7).as("v"))
    df.repartition(40).write.mode("overwrite").parquet(s"$dir/small")
    val smallBytes = spark.read.parquet(s"$dir/small").inputFiles.map(f =>
      new java.io.File(new java.net.URI(f).getPath).length).sum

    val (before, after) = Layout.compact(spark, s"$dir/small", s"$dir/big",
      targetBytes = smallBytes / 4 + 1, clusterBy = Seq(col("k")))
    assert(before == 40)
    assert(after <= 4, s"expected <=4 files, got $after")
    // nothing lost, nothing duplicated
    val a = spark.read.parquet(s"$dir/small").collect().map(_.toSeq).toSet
    val b = spark.read.parquet(s"$dir/big").collect().map(_.toSeq).toSet
    assert(a == b && b.size == 20000)
    // the clustering pass tightened per-file k ranges: each output
    // file covers a narrow k band, not the full 0..96 domain
    val spans = spark.read.parquet(s"$dir/big").inputFiles.map { f =>
      val r = spark.read.parquet(f).agg(min("k"), max("k")).collect().head
      r.getLong(1) - r.getLong(0)
    }
    assert(spans.forall(_ < 97 / 2), spans.mkString(","))
    // in-place compaction is refused, not silently destructive
    intercept[IllegalArgumentException] {
      Layout.compact(spark, s"$dir/big", s"$dir/big", 1L << 20)
    }
  }
}
