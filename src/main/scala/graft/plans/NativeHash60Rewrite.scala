package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Cast, Conv, Expression, Literal, Md5, Substring}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{BinaryType, LongType, StringType}

/** Optimizer rule: rewrite the PORTABLE spelling of the 60-bit hash —
  * `CAST(conv(substring(md5(x), 1, 15), 16, 10) AS BIGINT)`, the form
  * any engine-agnostic SQL (or a DuckDB-oracle twin pasted into Spark)
  * naturally uses — into the native [[Md5Hash60]] kernel: same value
  * (pinned by Md5Hash60Spec), no hex-string materialization, no base
  * conversion, one static call inside whole-stage codegen. With the
  * rule injected ([[GraftExtensions]]), a user can write the portable
  * form everywhere and still get native-kernel plans — the
  * MinHash/sampling/sharding hot path does tens of millions of these
  * calls per corpus pass.
  *
  * Matched exactly: base 16 → 10, substring(1, 15), md5 over a
  * string (the analyzer's string→binary implicit cast is unwrapped —
  * md5 digests the same UTF-8 bytes either way). Anything else is
  * left untouched. Disable with
  * `spark.graft.nativeHashRewrite=false` (Md5Hash60Spec does, to keep
  * the native-vs-composed value pin honest — otherwise it would
  * compare the kernel against itself).
  */
case class NativeHash60Rewrite() extends Rule[LogicalPlan] {
  private def intLit(e: Expression, v: Int): Boolean = e match {
    case Literal(x: Int, _) => x == v
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!conf.getConfString("spark.graft.nativeHashRewrite", "true").toBoolean) plan
    else plan.transformAllExpressions {
      case c: Cast if c.dataType == LongType =>
        c.child match {
          case conv: Conv
              if intLit(conv.fromBaseExpr, 16) && intLit(conv.toBaseExpr, 10) =>
            conv.numExpr match {
              case ss: Substring if intLit(ss.pos, 1) && intLit(ss.len, 15) =>
                ss.str match {
                  case Md5(inner) => inner match {
                    case c2: Cast if c2.dataType == BinaryType &&
                        c2.child.dataType == StringType => Md5Hash60(c2.child)
                    case _ => c
                  }
                  case _ => c
                }
              case _ => c
            }
          case _ => c
        }
    }
  }
}
