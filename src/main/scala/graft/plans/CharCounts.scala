package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen'd per-character frequency profile of a string:
  * returns the character counts (one per DISTINCT code point) sorted
  * ascending, as `array<double>` — exactly the multiset
  *
  * {{{ sort_array(transform(array_distinct(cs),
  *       t -> CAST(size(filter(cs, x -> x = t)) AS DOUBLE))) }}}
  *
  * over `cs = filter(split(text, ''), c -> c <> '')`, but as ONE
  * primitive pass (ASCII counting array + code-point map fallback)
  * instead of per-character array allocation plus either an
  * O(len·distinct) nested scan or an O(len log len) sort — measured
  * 6× under the HOF forms on the sf0.1 corpus, where `txt_entropy`'s
  * per-row cost is the whole query (docs/BENCH_NOTES.md round 5).
  * The count MULTISET is what downstream entropy folds consume; its
  * sorted order makes the double fold deterministic cross-engine
  * (SURVEY.md §7.3), and the values are exact integers in doubles, so
  * the DuckDB oracle is unaffected. Parity with both HOF formulations
  * is asserted in DotProductSpec.
  */
case class CharCounts(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_char_counts expects string, got ${child.dataType.simpleString}")

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "graft_char_counts"

  override def nullSafeEval(input: Any): Any =
    CharCounts.counts(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.CharCounts.counts($c)")

  override protected def withNewChildInternal(newChild: Expression): CharCounts =
    copy(child = newChild)
}

object CharCounts {

  /** Shared by interpreted eval and generated code. Counts CODE POINTS
    * (what Spark's `split(text, '')` yields for UTF8String input). */
  def counts(s: UTF8String): ArrayData = {
    val str = s.toString
    val ascii = new Array[Int](128)
    var other: java.util.HashMap[Integer, Array[Int]] = null
    var i = 0
    val n = str.length
    while (i < n) {
      val cp = str.codePointAt(i)
      if (cp < 128) ascii(cp) += 1
      else {
        if (other == null) other = new java.util.HashMap[Integer, Array[Int]]()
        val cell = other.get(cp)
        if (cell == null) other.put(cp, Array(1)) else cell(0) += 1
      }
      i += Character.charCount(cp)
    }
    var m = 0
    var j = 0
    while (j < 128) { if (ascii(j) > 0) m += 1; j += 1 }
    if (other != null) m += other.size
    val out = new Array[Double](m)
    var k = 0
    j = 0
    while (j < 128) { if (ascii(j) > 0) { out(k) = ascii(j); k += 1 }; j += 1 }
    if (other != null) {
      val it = other.values().iterator()
      while (it.hasNext) { out(k) = it.next()(0); k += 1 }
    }
    java.util.Arrays.sort(out)
    new GenericArrayData(out)
  }

  val info = new ExpressionInfo(classOf[CharCounts].getName, "graft_char_counts")

  /** Register `graft_char_counts` into a live session (idempotent). */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("graft_char_counts"), info,
      { children: Seq[Expression] =>
        require(children.size == 1, "graft_char_counts expects 1 argument")
        CharCounts(children.head)
      })
}
