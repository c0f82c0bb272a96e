package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Session-extension registration of the library's native Catalyst
  * expressions as SQL functions — the deploy-grade alternative to the
  * per-session `createOrReplaceTempFunction` helpers: with
  * `spark.sql.extensions=graft.plans.GraftExtensions` (or
  * `builder.withExtensions`, as [[graft.Sessions]] does), EVERY session
  * in the application — including Thrift/Connect sessions that never
  * touch Scala code — can call the kernels from plain SQL:
  *
  *  - `graft_hash60(str)` → the 60-bit md5 ([[Md5Hash60]]): the
  *    cross-engine-deterministic hash behind sampling, sharding,
  *    MinHash, and stable surrogate keys;
  *  - `graft_dot(a, b)` → the codegen'd float/double dot product
  *    ([[DotProduct]]): the similarity hot kernel.
  *
  * Injection registers the builder in the session's FunctionRegistry
  * at analysis time, so the functions resolve like built-ins and the
  * resulting plans are byte-identical to the DSL path (pinned by
  * ExtensionsSpec; q77 puts the SQL-injected path into the DuckDB
  * oracle gate).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    // Peephole optimizer rule: the portable composed spelling of the
    // 60-bit hash collapses to the native kernel (see
    // [[NativeHash60Rewrite]]).
    ext.injectOptimizerRule(_ => NativeHash60Rewrite())
    // View-matching rule: aggregates over a registered base table
    // re-target its materialized rollup (see [[SummaryRewrite]]).
    ext.injectOptimizerRule(_ => SummaryRewriteRule())
    ext.injectFunction((
      FunctionIdentifier("graft_hash60"),
      new ExpressionInfo(classOf[Md5Hash60].getCanonicalName, "graft_hash60"),
      (args: Seq[Expression]) => {
        require(args.length == 1, s"graft_hash60 expects 1 argument, got ${args.length}")
        Md5Hash60(args.head)
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProduct].getCanonicalName, "graft_dot"),
      (args: Seq[Expression]) => {
        require(args.length == 2, s"graft_dot expects 2 arguments, got ${args.length}")
        DotProduct(args.head, args(1))
      }))
    // int8 vector codec — the storage kernels of the quantized index
    ext.injectFunction((
      FunctionIdentifier("graft_int8_pack"),
      new ExpressionInfo(classOf[Int8Pack].getCanonicalName, "graft_int8_pack"),
      (args: Seq[Expression]) => {
        require(args.length == 1, s"graft_int8_pack expects 1 argument, got ${args.length}")
        Int8Pack(args.head)
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_int8_unpack"),
      new ExpressionInfo(classOf[Int8Unpack].getCanonicalName, "graft_int8_unpack"),
      (args: Seq[Expression]) => {
        require(args.length == 1, s"graft_int8_unpack expects 1 argument, got ${args.length}")
        Int8Unpack(args.head)
      }))
  }
}
