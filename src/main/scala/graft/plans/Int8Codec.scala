package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, IntegerType}

/** Native int8 vector codec — the STORAGE half of embedding
  * quantization ([[graft.operators.Quantize.int8AbsMax]] produces
  * `array<int>` in [−127, 127], which parquet stores as 4 bytes per
  * component; a quantized INDEX only realizes its 4× promise if the
  * persisted form is ONE byte per component). [[Int8Pack]] narrows an
  * int array to a binary column (fails loudly on out-of-range values
  * — a silent wrap would corrupt every downstream dot product);
  * [[Int8Unpack]] widens it back exactly. Round-trip identity is
  * pinned by Int8CodecSpec; the oracle never sees the bytes — serving
  * unpacks before arithmetic, so the DuckDB replay works on the
  * integer values (q204's discipline).
  *
  * Both are codegen'd single static calls (no higher-order functions,
  * no boxing in the loop), keeping the surrounding write/serve
  * projection inside whole-stage codegen.
  */
case class Int8Pack(child: Expression) extends UnaryExpression {
  override def dataType: DataType = BinaryType
  override def prettyName: String = "int8_pack"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(IntegerType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"int8_pack requires array<int>, got ${other.catalogString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    Int8Codec.pack(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.Int8Codec.pack($c)")

  override protected def withNewChildInternal(newChild: Expression): Int8Pack =
    copy(child = newChild)
}

case class Int8Unpack(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "int8_unpack"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"int8_unpack requires binary, got ${other.catalogString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    Int8Codec.unpack(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.Int8Codec.unpack($c)")

  override protected def withNewChildInternal(newChild: Expression): Int8Unpack =
    copy(child = newChild)
}

object Int8Codec {

  /** One byte per component; throws on null elements or values
    * outside [−128, 127] — quantization bugs must not wrap silently
    * into valid-looking codes. */
  def pack(a: ArrayData): Array[Byte] = {
    val n = a.numElements()
    val out = new Array[Byte](n)
    var i = 0
    while (i < n) {
      if (a.isNullAt(i))
        throw new IllegalArgumentException(s"int8_pack: null element at $i")
      val v = a.getInt(i)
      if (v < Byte.MinValue || v > Byte.MaxValue)
        throw new IllegalArgumentException(
          s"int8_pack: value $v at $i outside [-128, 127]")
      out(i) = v.toByte
      i += 1
    }
    out
  }

  def unpack(b: Array[Byte]): ArrayData = {
    val out = new Array[Int](b.length)
    var i = 0
    while (i < b.length) { out(i) = b(i).toInt; i += 1 }
    new GenericArrayData(out)
  }

  def pack(c: Column): Column = GraftBridge.column(Int8Pack(GraftBridge.expression(c)))
  def unpack(c: Column): Column = GraftBridge.column(Int8Unpack(GraftBridge.expression(c)))
}
