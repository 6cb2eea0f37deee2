package graft

import graft.core.Core
import graft.operators.SkewJoin
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Salted skew join must be result-identical to the plain equi-join. */
class SkewJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val dir = TestSpark.sfDir

  test("salted join == plain join on events ⋈ customer") {
    val events = Core.table(spark, dir, "events")
    val customer = Core.table(spark, dir, "customer")
    def key(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select(col("event_id"), col("c_custkey")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val plain = key(events.join(customer,
      events("user_id") === customer("c_custkey")))
    val salted = key(SkewJoin.saltedEquiJoin(
      events, customer, "user_id", "c_custkey", salt = 7))
    assert(plain == salted && plain.nonEmpty)
  }

  test("salted join spreads a hot key over multiple partitions") {
    import spark.implicits._
    // one pathological key: 10k rows of key=1 against a 2-row dim
    val big = (1 to 10000).map(i => (1L, i)).toDF("k", "payload")
    val dim = Seq((1L, "hot"), (2L, "cold")).toDF("dk", "name")
    val out = SkewJoin.saltedEquiJoin(big, dim, "k", "dk", salt = 8)
    assert(out.count() == 10000)
    // pre-join salted distribution: the hot key occupies all 8 salts
    val salts = big.withColumn("__salt",
      pmod(hash(monotonically_increasing_id()), lit(8)))
      .select("__salt").distinct().count()
    assert(salts == 8)
  }
}
