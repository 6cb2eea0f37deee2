package graft.plans

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Native codegen'd unsigned-byte sum over a `binary` column.
  *
  * Semantics are EXACTLY the hex-fold the multimodal energy measure
  * uses — `aggregate(sequence(1, octet_length(b)), 0L,
  * (acc, i) -> acc + conv(substr(hex(b), 2i-1, 2), 16, 10))` — i.e.
  * Σ unsigned(byte_i), but as one primitive loop over the byte array
  * instead of two string allocations and a radix parse PER BYTE
  * (≈5 M per run at sf0.1). Exact integer output, so the DuckDB
  * oracle (which keeps its own list_sum-over-hex formulation) is
  * unaffected; parity asserted in DotProductSpec.
  */
case class ByteSum(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_bytesum expects binary, got ${child.dataType.simpleString}")

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_bytesum"

  override def nullSafeEval(input: Any): Any =
    ByteSum.sum(input.asInstanceOf[Array[Byte]])

  // expression-position codegen: one static-call primitive loop, no
  // intermediate strings
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, b => s"graft.plans.ByteSum.sum($b)")

  override protected def withNewChildInternal(newChild: Expression): ByteSum =
    copy(child = newChild)
}

object ByteSum {
  /** Shared by interpreted eval and generated code. */
  def sum(bytes: Array[Byte]): Long = {
    var s = 0L
    var i = 0
    while (i < bytes.length) { s += bytes(i) & 0xff; i += 1 }
    s
  }

  val info = new ExpressionInfo(classOf[ByteSum].getName, "graft_bytesum")

  def bytesum(c: Column): Column =
    org.apache.spark.sql.functions.call_function("graft_bytesum", c)

  /** Register `graft_bytesum` into a live session (idempotent). */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("graft_bytesum"), info,
      { children: Seq[Expression] =>
        require(children.size == 1, "graft_bytesum expects 1 argument")
        ByteSum(children.head)
      })
}
