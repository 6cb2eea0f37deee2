package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen'd winnowing fingerprint selection (Schleimer et al.,
  * SIGMOD'03): rolling 31-base hashes of every [[Winnow.K]]-code-point
  * gram mod P, minimum of each [[Winnow.W]]-gram window selected,
  * distinct selected hashes returned in first-occurrence order as
  * `array<long>` — exactly the HOF formulation
  *
  * {{{ array_distinct(transform(sequence(1, greatest(m - W + 1, 1)),
  *       j -> array_min(slice(gh, j, W)))) }}}
  *
  * over `gh = transform(sequence(1, n - K + 1), i ->
  * aggregate(slice(codes, i, K), 0L, (a, c) -> (a * 31 + c) % P))`,
  * but as ONE primitive pass: the O(n·K) per-gram re-fold becomes an
  * O(n) rolling update (subtract the leaving code's 31^(K−1) term,
  * shift, add the entering code), and no per-gram slice arrays are
  * allocated. Higher-order-function lambdas run INTERPRETED outside
  * whole-stage codegen, and a no-exchange map-side plan executes at
  * input-split parallelism (docs/PLANS.md) — per-row expression cost
  * IS the query at bench scale, the same mechanism that motivated
  * `graft_char_counts` (measured there: 6× under the HOF forms).
  * Parity with the HOF formulation is asserted in DotProductSpec.
  */
case class Winnow(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_winnow expects string, got ${child.dataType.simpleString}")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_winnow"

  override def nullSafeEval(input: Any): Any =
    Winnow.fingerprints(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.Winnow.fingerprints($c)")

  override protected def withNewChildInternal(newChild: Expression): Winnow =
    copy(child = newChild)
}

object Winnow {

  /** Gram width (code points) and selection-window width (grams) —
    * the contract geometry; any shared run of K + W − 1 code points
    * shares a selected fingerprint (the paper's guarantee). */
  val K = 8
  val W = 4

  private val P = 2147483647L
  /** 31^(K−1) mod P — the leaving code point's positional weight. */
  private val PowK1: Long = {
    var p = 1L
    var i = 0
    while (i < K - 1) { p = p * 31 % P; i += 1 }
    p
  }

  /** Shared by interpreted eval and generated code. Code-point
    * iteration matches `filter(split(text, ''), c -> c <> '')` +
    * `ascii(c)` — one element per code point, its scalar value. */
  def fingerprints(s: UTF8String): ArrayData = {
    val str = s.toString
    // code points
    var n = 0
    var i = 0
    while (i < str.length) { n += 1; i += Character.charCount(str.codePointAt(i)) }
    if (n < K) return new GenericArrayData(Array.emptyLongArray)
    val codes = new Array[Long](n)
    i = 0
    var ci = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      codes(ci) = cp.toLong
      ci += 1
      i += Character.charCount(cp)
    }
    // rolling gram hashes: h(i+1) = ((h(i) − c(i)·31^(K−1))·31 + c(i+K)) mod P
    val m = n - K + 1
    val gh = new Array[Long](m)
    var h = 0L
    i = 0
    while (i < K) { h = (h * 31 + codes(i)) % P; i += 1 }
    gh(0) = h
    i = 1
    while (i < m) {
      h = (h - codes(i - 1) * PowK1 % P + P) % P
      h = (h * 31 + codes(i + K - 1)) % P
      gh(i) = h
      i += 1
    }
    // window minima, distinct in first-occurrence order
    val seen = new java.util.HashSet[java.lang.Long]()
    val out = new java.util.ArrayList[java.lang.Long]()
    val nWin = math.max(m - W + 1, 1)
    var j = 0
    while (j < nWin) {
      var mn = gh(j)
      var t = j + 1
      val end = math.min(j + W, m)
      while (t < end) { if (gh(t) < mn) mn = gh(t); t += 1 }
      if (seen.add(mn)) out.add(mn)
      j += 1
    }
    val arr = new Array[Long](out.size)
    var o = 0
    while (o < arr.length) { arr(o) = out.get(o); o += 1 }
    new GenericArrayData(arr)
  }

  val info = new ExpressionInfo(classOf[Winnow].getName, "graft_winnow")

  /** Register `graft_winnow` into a live session (idempotent). */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("graft_winnow"), info,
      { children: Seq[Expression] =>
        require(children.size == 1, "graft_winnow expects 1 argument")
        Winnow(children.head)
      })
}
