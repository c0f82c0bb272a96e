package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Quantize, Sketches}

/** Unit semantics for int8 absmax quantization and the count-min
  * heavy-hitter envelope.
  */
class QuantizeSketchSpec extends AnyFunSuite {
  lazy val spark = Sessions.local(4)
  import spark.implicits._

  // ---------------------------------------------------- quantize

  test("int8AbsMax: exact values, saturation at ±127, zero-vector guard") {
    val df = Seq(
      (1L, Array(1.0f, -1.0f, 0.5f)),   // scale 1 → q = [127, -127, 63]
      (2L, Array(0.0f, 0.0f, 0.0f)),    // zero vector → q = [0, 0, 0]
      (3L, Array(-2.0f, 1.0f, 0.25f))   // scale 2 → q = [-127, 63, 15]
    ).toDF("vec_id", "embedding")
    val got = Quantize.int8AbsMax(df, "embedding")
      .select(col("vec_id"), col("scale"), col("q"))
      .collect().map(r => r.getAs[Long]("vec_id") ->
        (r.getAs[Double]("scale"), r.getAs[Seq[Int]]("q"))).toMap
    assert(got(1L) == (1.0, Seq(127, -127, 63)))   // floor(0.5·127)=63
    assert(got(2L) == (0.0, Seq(0, 0, 0)))
    assert(got(3L) == (2.0, Seq(-127, 63, 15)))    // floor(63.5)=63, floor(15.875)=15
  }

  test("int8AbsMax reconstruction error is below one quantization step") {
    val df = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val err = Quantize.int8AbsMax(df, "embedding")
      .filter(col("scale") > 0)
      .select(max(array_max(zip_with(
        transform(col("embedding"), x => x.cast("double")),
        col("q"),
        (x, q) => abs(x - q * col("scale") / lit(127.0))))).as("max_err"),
        max(col("scale")).as("max_scale"))
      .collect().head
    assert(err.getAs[Double]("max_err") < err.getAs[Double]("max_scale") / 127.0 + 1e-12)
  }

  test("int8AbsMax fails fast on output-name collisions") {
    val df = Seq((1L, Array(1.0f), 0.0)).toDF("vec_id", "embedding", "scale")
    intercept[IllegalArgumentException] { Quantize.int8AbsMax(df, "embedding") }
  }

  // ----------------------------------------------------- sketches

  test("heavyHittersChecked: exact counts, deterministic boundary, honest envelope") {
    // user 1 ×5, user 2 ×3, users 3 and 4 ×2 (tie at the k=3 boundary
    // → user 3 wins by key), user 5 ×1
    val rows = Seq.fill(5)(1L) ++ Seq.fill(3)(2L) ++ Seq(3L, 3L, 4L, 4L, 5L)
    val df = rows.map(u => (u, "e")).toDF("user_id", "event_type")
    val got = Sketches.heavyHittersChecked(df, "user_id", k = 3,
        eps = 0.01, confidence = 0.99, seed = 7)
      .collect().map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("n_rows"),
        r.getAs[Boolean]("within_eps"))).toSeq
    assert(got == Seq((1L, 5L, true), (2L, 3L, true), (3L, 2L, true)))
  }

  test("heavyHittersChecked envelope holds on the events table") {
    val df = Tables.events(spark, "/root/testdata/sf0.001")
    val got = Sketches.heavyHittersChecked(df, "user_id", k = 10,
        eps = 0.001, confidence = 0.999, seed = 42).collect()
    assert(got.length == 10)
    assert(got.forall(_.getAs[Boolean]("within_eps")))
  }
}
