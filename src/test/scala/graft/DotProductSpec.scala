package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Similarity

/** Pins the native [[graft.plans.DotProduct]] kernel bit-identical to
  * the `aggregate(zip_with(...))` composition (= DuckDB
  * `list_inner_product`) on real embedding vectors, including the
  * composition's null semantics.
  */
class DotProductSpec extends AnyFunSuite {
  lazy val spark = Sessions.local(4)
  import spark.implicits._

  test("native == composition on all embedding pairs (bit-exact)") {
    val e = Tables.embeddings(spark, "/root/testdata/sf0.001").limit(50)
    val pairs = e.select(col("vec_id").as("ida"), col("embedding").as("va"))
      .crossJoin(e.select(col("vec_id").as("idb"), col("embedding").as("vb")))
    val diff = pairs.select(
        Similarity.dot(col("va"), col("vb")).as("native"),
        Similarity.dotComposed(col("va"), col("vb")).as("composed"))
      .filter(!(col("native") <=> col("composed")))
      .count()
    assert(diff == 0L)
  }

  test("null array, null element, and length mismatch all yield null") {
    val df = Seq(
      (Some(Seq(1.0f, 2.0f)), Some(Seq(3.0f, 4.0f))), // 11.0
      (None, Some(Seq(1.0f))),                        // null array
      (Some(Seq(1.0f, 2.0f)), Some(Seq(1.0f)))        // length mismatch
    ).toDF("a", "b")
    val out = df.select(Similarity.dot(col("a"), col("b")).as("d")).collect()
    assert(out(0).getDouble(0) == 11.0)
    assert(out(1).isNullAt(0) && out(2).isNullAt(0))
    val withNullElem = spark.sql(
      "SELECT array(CAST(1.0 AS FLOAT), CAST(NULL AS FLOAT)) AS a, array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)) AS b")
    assert(withNullElem.select(Similarity.dot(col("a"), col("b"))).collect().head.isNullAt(0))
  }

  test("kernel works inside higher-order lambdas (the ivfAssign shape)") {
    val e = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val assigned = Similarity.ivfAssign(e, e.filter(col("vec_id") < 4), "vec_id", "embedding")
    assert(assigned.filter(col("centroid_id") >= 0).count() == e.count())
  }
}
