package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Custom typed aggregation surface (`Aggregator[IN, BUF, OUT]`): exact
  * running (min, max, count, cents-sum) of a double measure. The buffer
  * is mergeable and order-insensitive (min/max/longs), so partial
  * aggregation across partitions is exact — the same property the cents
  * scheme gives built-in sums. Exposed to untyped DataFrames via
  * `functions.udaf` (see RelationalOps "agg_typed_custom").
  */
object RangeStats {

  case class Buf(min: Double, max: Double, n: Long, cents: Long)
  case class Out(min_v: Double, max_v: Double, n: Long, total: Double)

  val aggregator: Aggregator[Double, Buf, Out] =
    new Aggregator[Double, Buf, Out] {
      override def zero: Buf =
        Buf(Double.PositiveInfinity, Double.NegativeInfinity, 0L, 0L)
      override def reduce(b: Buf, x: Double): Buf =
        Buf(math.min(b.min, x), math.max(b.max, x), b.n + 1,
          b.cents + math.round(x * 100))
      override def merge(a: Buf, b: Buf): Buf =
        Buf(math.min(a.min, b.min), math.max(a.max, b.max), a.n + b.n,
          a.cents + b.cents)
      override def finish(b: Buf): Out =
        if (b.n == 0) Out(0.0, 0.0, 0L, 0.0)
        else Out(b.min, b.max, b.n, b.cents / 100.0)
      override def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
      override def outputEncoder: Encoder[Out] = Encoders.product[Out]
    }
}
