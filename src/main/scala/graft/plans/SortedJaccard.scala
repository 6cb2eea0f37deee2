package graft.plans

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native codegen'd Jaccard over two SORTED, DISTINCT `array<string>`
  * columns.
  *
  * Semantics are EXACTLY
  * `size(array_intersect(a, b)) / size(array_union(a, b))` for arrays
  * that are already element-distinct (both operands of every call site
  * are `array_distinct` outputs), but computed as one two-pointer merge
  * over the sorted arrays: zero allocation per row, a tight
  * whole-stage-codegen'd loop of `UTF8String.compareTo` calls. The
  * built-ins build a hash set PER PAIR; the dedup verify stages
  * evaluate this once per CANDIDATE pair (hundreds of thousands of
  * rows at sf0.1, corpus-scaled beyond), so the per-row constant is
  * the stage's CPU. Sorting happens once per DOCUMENT (map-side
  * `sort_array` on the cached per-doc relation), not once per pair —
  * `sort_array`'s string ordering is `UTF8String` binary order, the
  * same order this merge compares by.
  *
  * The intersection/union COUNTS are exact integers, so the closing
  * double division is bit-identical to the built-in formulation and
  * the DuckDB oracle is unaffected (asserted in DotProductSpec).
  *
  * CONTRACT DIVERGENCE, empty inputs only: for two EMPTY arrays this
  * returns 0.0 where the built-in `size(array_intersect)/size(
  * array_union)` yields null (0/0). Unreachable at every current call
  * site (`split` always yields >= 1 element, and the verify joins feed
  * non-empty token sets), and 0.0 is the conventional "no similarity"
  * reading — but a new caller that needs exact built-in parity on
  * empty arrays must guard with `when(size(a) + size(b) === 0, ...)`.
  * Returning null here instead would force `nullable = true` onto
  * every call site's schema, changing result-schema nullability for a
  * case that cannot occur.
  */
case class SortedJaccard(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(StringType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_jaccard expects (array<string>, array<string>), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_jaccard"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val (nx, ny) = (x.numElements(), y.numElements())
    var i = 0
    var j = 0
    var inter = 0
    while (i < nx && j < ny) {
      val c = x.getUTF8String(i).compareTo(y.getUTF8String(j))
      if (c == 0) { inter += 1; i += 1; j += 1 }
      else if (c < 0) i += 1
      else j += 1
    }
    val union = nx + ny - inter
    if (union == 0) 0.0 else inter.toDouble / union
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val inter = ctx.freshName("inter")
      val c = ctx.freshName("c")
      val union = ctx.freshName("union")
      s"""
         |int $nx = $a.numElements();
         |int $ny = $b.numElements();
         |int $i = 0; int $j = 0; int $inter = 0;
         |while ($i < $nx && $j < $ny) {
         |  int $c = $a.getUTF8String($i).compareTo($b.getUTF8String($j));
         |  if ($c == 0) { $inter++; $i++; $j++; }
         |  else if ($c < 0) { $i++; } else { $j++; }
         |}
         |int $union = $nx + $ny - $inter;
         |${ev.value} = $union == 0 ? 0.0 : ((double) $inter) / $union;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedJaccard =
    copy(left = newLeft, right = newRight)
}

object SortedJaccard {
  /** Column-API entry: callers supply SORTED distinct token arrays and
    * must [[register]] first (call sites do, idempotently). */
  def jaccardSorted(a: Column, b: Column): Column =
    org.apache.spark.sql.functions.call_function("graft_jaccard", a, b)

  val info = new ExpressionInfo(classOf[SortedJaccard].getName, "graft_jaccard")

  /** Register `graft_jaccard` into a live session (idempotent). */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("graft_jaccard"), info,
      { children: Seq[Expression] =>
        require(children.size == 2, "graft_jaccard expects 2 arguments")
        SortedJaccard(children.head, children(1))
      })
}
