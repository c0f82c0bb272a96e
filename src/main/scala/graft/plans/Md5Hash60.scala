package graft.plans

import java.security.MessageDigest

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native 60-bit md5 hash: value-identical to the built-in composition
  * `conv(substr(md5(x), 1, 15), 16, 10)` (= DuckDB
  * `CAST('0x' || substr(md5(x),1,15) AS BIGINT)`) but computed straight
  * from the digest bytes — no hex-string materialization, no base
  * conversion, no intermediate UTF8Strings.
  *
  * This is the hot kernel of MinHash signatures (shingles × perms
  * hashes per document — tens of millions of calls at bench scale), so
  * it earns the custom-`Expression` treatment per the preference order
  * in SURVEY.md §4: compose built-ins first, drop to a native
  * expression only where the hot path justifies it. Codegen emits a
  * single static call, keeping the surrounding operator inside
  * whole-stage codegen.
  */
case class Md5Hash60(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "hash60"
  // deterministic pure function → Catalyst constant-folds literal args
  override def foldable: Boolean = child.foldable

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"hash60 requires a string argument, got ${child.dataType.catalogString}")

  override protected def nullSafeEval(input: Any): Any =
    Md5Hash60.hash(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.Md5Hash60.hash($c)")

  override protected def withNewChildInternal(newChild: Expression): Md5Hash60 =
    copy(child = newChild)
}

object Md5Hash60 {
  private val digest: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))

  /** First 15 hex chars of md5 == big-endian first 8 digest bytes with
    * the low nibble dropped (>>> 4) — 60 bits, always non-negative. */
  def hash(s: UTF8String): Long = {
    val md = digest.get()
    md.reset()
    val d = md.digest(s.getBytes)
    val top =
      (d(0) & 0xffL) << 56 | (d(1) & 0xffL) << 48 | (d(2) & 0xffL) << 40 |
        (d(3) & 0xffL) << 32 | (d(4) & 0xffL) << 24 | (d(5) & 0xffL) << 16 |
        (d(6) & 0xffL) << 8 | (d(7) & 0xffL)
    top >>> 4
  }

  def apply(c: Column): Column =
    GraftBridge.column(Md5Hash60(GraftBridge.expression(c)))

  /** SQL registration: `SELECT hash60(text) FROM ...`. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "hash60", exprs => Md5Hash60(exprs.head), "scala_udf")
}
