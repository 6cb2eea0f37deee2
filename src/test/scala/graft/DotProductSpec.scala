package graft

import graft.plans.GraftFunctions
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The native codegen'd dot product must be bit-identical to the
  * higher-order-function sequential fold it replaces (that identity is
  * what keeps the DuckDB cosine oracles exact). */
class DotProductSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("graft_dot == zip_with/aggregate fold, bitwise, on real embeddings") {
    GraftFunctions.register(spark)
    val e = graft.core.Core.table(spark, TestSpark.sfDir, "embeddings")
      .select(col("vec_id"),
        col("embedding").cast("array<double>").as("v"))
    val both = e.select(
      col("vec_id"),
      call_function("graft_dot", col("v"), col("v")).as("native"),
      aggregate(zip_with(col("v"), col("v"), _ * _), lit(0.0d), _ + _)
        .as("hof"))
    val mismatches = both.filter(
      col("native") =!= col("hof")).count()
    assert(mismatches == 0)
    // and it's actually used via codegen: plan contains the expression
    assert(both.queryExecution.executedPlan.toString.contains("graft_dot"))
  }

  test("graft_dot rejects wrong input types") {
    GraftFunctions.register(spark)
    import spark.implicits._
    val bad = intercept[Exception] {
      Seq((Seq("a"), Seq("b"))).toDF("x", "y")
        .select(call_function("graft_dot", col("x"), col("y"))).collect()
    }
    assert(bad.getMessage.toLowerCase.contains("graft_dot")
      || bad.getMessage.contains("DATATYPE_MISMATCH"), bad.getMessage)
  }

  test("registration is idempotent and works via extensions class") {
    GraftFunctions.register(spark)
    GraftFunctions.register(spark)
    val r = spark.sql("SELECT graft_dot(array(1.0d, 2.0d), array(3.0d, 4.0d))")
      .head().getDouble(0)
    assert(r == 11.0)
  }
}
