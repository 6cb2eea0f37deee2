package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen'd token-repetition statistics of a (pre-lowercased)
  * string: splits on single spaces exactly like `split(s, " ")`
  * (Java regex semantics, empties preserved) and returns
  * `struct(n, top_cnt, n_bigrams, n_distinct_bigrams)` — the exact
  * integers behind the Gopher repetition fractions:
  *
  * {{{ n        = size(toks)
  *     top_cnt  = array_max(transform(array_distinct(toks),
  *                  t -> size(filter(toks, x -> x = t))))
  *     bg       = transform(slice(toks, 1, greatest(n - 1, 0)),
  *                  (t, i) -> concat(t, ' ', toks[i + 1]))
  *     n_bigrams = size(bg); n_distinct_bigrams = size(array_distinct(bg)) }}}
  *
  * as ONE primitive pass (token-interning hash map + a long-keyed
  * bigram set) instead of the O(n·distinct) nested lambda scan the HOF
  * form pays per row — interpreted, outside whole-stage codegen, and
  * at split parallelism on a no-exchange plan (docs/PLANS.md), which
  * profiled as the single 7.4 s one-task stage under every
  * curate-family query (pipeline_curate/_full/_pack/_stats) and
  * txt_repetition. Bigram identity via interned token ids packed into
  * one long — equal iff both tokens equal, exactly the concat-string
  * equality (tokens cannot contain the separator). Parity with the
  * HOF formulation is asserted in DotProductSpec.
  */
case class TokStats(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_tok_stats expects string, got ${child.dataType.simpleString}")

  override def dataType: DataType = StructType(Seq(
    StructField("n", IntegerType, nullable = false),
    StructField("top_cnt", IntegerType, nullable = false),
    StructField("n_bigrams", IntegerType, nullable = false),
    StructField("n_distinct_bigrams", IntegerType, nullable = false)))
  override def prettyName: String = "graft_tok_stats"

  override def nullSafeEval(input: Any): Any =
    TokStats.stats(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.TokStats.stats($c)")

  override protected def withNewChildInternal(newChild: Expression): TokStats =
    copy(child = newChild)
}

object TokStats {

  /** Shared by interpreted eval and generated code. */
  def stats(s: UTF8String): InternalRow = {
    val str = s.toString
    // split(str, " ") with Java limit -1 semantics: n = spaces + 1,
    // empties (leading/trailing/consecutive) are tokens
    val ids = new java.util.HashMap[String, Integer]()
    val cnt = new java.util.ArrayList[Array[Int]]()
    var n = 0
    var topCnt = 0
    var prevId = -1
    var nBigrams = 0
    val bigrams = new java.util.HashSet[java.lang.Long]()
    var start = 0
    var i = 0
    val len = str.length
    while (i <= len) {
      if (i == len || str.charAt(i) == ' ') {
        val tok = str.substring(start, i)
        var id = ids.get(tok)
        if (id == null) {
          id = Integer.valueOf(ids.size)
          ids.put(tok, id)
          cnt.add(Array(0))
        }
        val cell = cnt.get(id)
        cell(0) += 1
        if (cell(0) > topCnt) topCnt = cell(0)
        if (prevId >= 0) {
          nBigrams += 1
          bigrams.add((prevId.toLong << 32) | (id.toLong & 0xffffffffL))
        }
        prevId = id
        n += 1
        start = i + 1
      }
      i += 1
    }
    new GenericInternalRow(
      Array[Any](n, topCnt, nBigrams, bigrams.size))
  }

  val info = new ExpressionInfo(classOf[TokStats].getName, "graft_tok_stats")

  /** Register `graft_tok_stats` into a live session (idempotent). */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("graft_tok_stats"), info,
      { children: Seq[Expression] =>
        require(children.size == 1, "graft_tok_stats expects 1 argument")
        TokStats(children.head)
      })
}
