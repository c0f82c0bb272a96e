package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TextFunctions
import graft.plans.Md5Hash60

/** The native hash60 expression must be value-identical to the
  * built-in composition (and therefore to the DuckDB oracle form). */
class Md5Hash60Spec extends AnyFunSuite {
  lazy val spark = Sessions.local(4)

  test("native hash60 == conv(substr(md5)) composition on real text") {
    // NativeHash60Rewrite would silently turn the composed side into
    // the native kernel and make this pin compare the kernel against
    // itself — disable it so the built-in composition actually runs
    val key = "spark.graft.nativeHashRewrite"
    spark.conf.set(key, "false")
    try {
      val docs = Tables.documents(spark, "/root/testdata/sf0.001")
      val toks = docs.select(explode(TextFunctions.tokens(col("text"))).as("t"))
      val withBoth = toks
        .select(TextFunctions.hash60(col("t")).as("native"),
          TextFunctions.hash60Composed(col("t")).as("composed"))
      assert(withBoth.queryExecution.optimizedPlan.toString.contains("conv("),
        "rewrite disabled: the composed form must survive into the plan")
      assert(withBoth.filter(col("native") =!= col("composed")).count() == 0L)
    } finally spark.conf.unset(key)
  }

  test("NativeHash60Rewrite collapses the portable spelling to the native kernel") {
    // DSL form
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val dsl = docs.select(TextFunctions.hash60Composed(col("text")).as("h"))
    val dslPlan = dsl.queryExecution.optimizedPlan.toString
    assert(dslPlan.contains("hash60(") && !dslPlan.contains("conv("), dslPlan)
    // SQL form, as an engine-agnostic user (or a pasted oracle twin)
    // would write it
    val sql = spark.sql(
      "SELECT CAST(conv(substring(md5(text), 1, 15), 16, 10) AS BIGINT) AS h " +
        "FROM parquet.`/root/testdata/sf0.001/documents.parquet`")
    val sqlPlan = sql.queryExecution.optimizedPlan.toString
    assert(sqlPlan.contains("hash60(") && !sqlPlan.contains("conv("), sqlPlan)
    // values match the native kernel exactly
    val native = docs.select(TextFunctions.hash60(col("text")).as("h"))
    assert(dsl.collect().map(_.getLong(0)).sorted.toSeq ==
      native.collect().map(_.getLong(0)).sorted.toSeq)
    // a NON-matching conv stays untouched (base 8, not part of the idiom)
    val other = docs.select(
      conv(substring(md5(col("text")), 1, 15), 16, 8).cast("long").as("h"))
    assert(other.queryExecution.optimizedPlan.toString.contains("conv("),
      "only the exact 16->10 idiom may be rewritten")
  }

  test("handles empty string, unicode, null") {
    import spark.implicits._
    val df = Seq(Some(""), Some("héllo wörld 中文"), None).toDF("s")
    val rows = df.select(TextFunctions.hash60(col("s")).as("n"),
      TextFunctions.hash60Composed(col("s")).as("c")).collect()
    rows.foreach { r =>
      if (r.isNullAt(0)) assert(r.isNullAt(1))
      else assert(r.getLong(0) == r.getLong(1))
    }
  }

  test("literal arguments constant-fold in the optimized plan") {
    val df = spark.range(1).select(TextFunctions.hash60(lit("abc")).as("h"))
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(!optimized.contains("hash60"),
      s"hash60(literal) should fold to a constant, plan: $optimized")
    assert(df.collect().head.getLong(0) ==
      df.select(TextFunctions.hash60Composed(lit("abc"))).collect().head.getLong(0))
  }

  test("registered SQL function works and codegen path is exercised") {
    Md5Hash60.register(spark)
    val n = spark.sql(
      "SELECT hash60(text) AS h FROM parquet.`/root/testdata/sf0.001/documents.parquet`")
      .filter(col("h") < 0).count()
    assert(n == 0L, "hash60 is 60-bit and never negative")
  }
}
