package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.types._

/** Native codegen'd dot product over two `array<double>` columns.
  *
  * Semantics are EXACTLY the sequential left fold
  * `aggregate(zip_with(a, b, _*_), 0.0, _+_)` used elsewhere in the
  * engine (and bit-identical to DuckDB's `list_dot_product`), but
  * whole-stage-codegen'd into a tight primitive loop instead of an
  * interpreted higher-order-function chain — the hot path of every
  * cosine-similarity operator. Arrays are assumed non-null-elemented
  * (embeddings are dense); length is the min of the two arrays.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_dot expects (array<double>, array<double>), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var sum = 0.0
    var i = 0
    while (i < n) { sum += x.getDouble(i) * y.getDouble(i); i += 1 }
    sum
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val sum = ctx.freshName("sum")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $sum = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $sum += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $sum;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

object GraftFunctions {
  val dotInfo = new ExpressionInfo(classOf[DotProduct].getName, "graft_dot")

  private val dotBuilder: Seq[Expression] => Expression = { children =>
    require(children.size == 2, "graft_dot expects 2 arguments")
    DotProduct(children.head, children(1))
  }

  /** Register into a live session (idempotent). */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("graft_dot"), dotInfo, dotBuilder)
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("graft_topk_pairs"), TopKPairs.info,
      TopKPairs.builder)
  }
}

/** `spark.sql.extensions=graft.plans.GraftExtensions` — the public
  * extension point; sessions built without it can call
  * [[GraftFunctions.register]] / [[SortedJaccard.register]] instead. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((FunctionIdentifier("graft_dot"),
      GraftFunctions.dotInfo,
      { children: Seq[Expression] => DotProduct(children.head, children(1)) }))
    ext.injectFunction((FunctionIdentifier("graft_jaccard"),
      SortedJaccard.info,
      { children: Seq[Expression] =>
        SortedJaccard(children.head, children(1)) }))
    ext.injectFunction((FunctionIdentifier("graft_char_counts"),
      CharCounts.info,
      { children: Seq[Expression] => CharCounts(children.head) }))
    ext.injectFunction((FunctionIdentifier("graft_topk_pairs"),
      TopKPairs.info, TopKPairs.builder))
  }
}
