package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Quantize
import graft.plans.Int8Codec

/** Round-13: the int8 vector codec — exact round-trip through the
  * binary narrowing, loud failure on out-of-range values, SQL
  * registration, and the quantize→pack→unpack chain the q204 index
  * rides.
  */
class Int8CodecSpec extends AnyFunSuite {
  lazy val spark = Sessions.local(4)

  test("pack/unpack round-trips exactly; bytes are one per component") {
    import spark.implicits._
    val df = Seq(
      (1L, Seq(-127, 0, 127, 5, -5)),
      (2L, Seq(0, 0, 0)),
      (3L, Seq(-128, 127))) // full byte range
      .toDF("id", "v")
    val got = df
      .withColumn("b", Int8Codec.pack(col("v")))
      .withColumn("r", Int8Codec.unpack(col("b")))
      .select(col("id"), col("v"), col("r"), length(col("b")).as("n"))
      .as[(Long, Seq[Int], Seq[Int], Int)].collect().toSeq.sortBy(_._1)
    got.foreach { case (id, v, r, n) =>
      assert(r == v, s"id=$id: $r != $v")
      assert(n == v.size, s"id=$id: $n bytes for ${v.size} components")
    }
  }

  test("out-of-range values fail loudly instead of wrapping") {
    import spark.implicits._
    val df = Seq((1L, Seq(128))).toDF("id", "v")
    val ex = intercept[Exception] {
      df.select(Int8Codec.pack(col("v"))).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e =>
        Option(e.getMessage).toSeq ++ messages(e.getCause))
    assert(messages(ex).exists(_.contains("outside [-128, 127]")),
      s"expected the range error, got $ex")
  }

  test("SQL surface: graft_int8_pack/unpack resolve via the injected extensions") {
    import spark.implicits._
    Seq((1L, Seq(1, -2, 3))).toDF("id", "v").createOrReplaceTempView("i8t")
    val got = spark.sql(
      "SELECT graft_int8_unpack(graft_int8_pack(v)) AS r FROM i8t")
      .as[Seq[Int]].collect().head
    assert(got == Seq(1, -2, 3))
  }

  test("quantize -> pack -> unpack preserves the exact codes int8AbsMax produced") {
    import spark.implicits._
    val df = Seq(
      (1L, Seq(0.5, -1.0, 0.25, 0.0)),
      (2L, Seq(1e-9, -1e-9))).toDF("id", "v")
    val q = Quantize.int8AbsMax(df, "v")
    val got = q.withColumn("r",
        Int8Codec.unpack(Int8Codec.pack(col("q"))))
      .select(col("id"), col("q"), col("r"))
      .as[(Long, Seq[Int], Seq[Int])].collect().toSeq
    got.foreach { case (id, codes, r) =>
      assert(r == codes, s"id=$id: $r != $codes") }
  }
}
