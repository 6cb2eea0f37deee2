package graft

import graft.functions.TextHash
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The Spark tokHash expression must equal the pure-Scala reference
  * fold on arbitrary tokens (the same fold the DuckDB oracle SQL
  * re-implements — three-way agreement by transitivity with the
  * oracle-green dedup queries). */
class HashParitySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("Spark tokHash expression == pure-Scala fold on 300 random tokens") {
    import spark.implicits._
    val rng = new scala.util.Random(42)
    val tokens = Seq.fill(300)(
      rng.alphanumeric.take(1 + rng.nextInt(14)).mkString.toLowerCase)
      .distinct
    val got = tokens.toDF("tok")
      .select(col("tok"), TextHash.tokHash(col("tok")).as("h"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    tokens.foreach { t =>
      assert(got(t) == EngineProperties.tokHashRef(t), s"token '$t'")
    }
  }
}
