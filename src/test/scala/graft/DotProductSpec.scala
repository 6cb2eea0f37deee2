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

  test("graft_jaccard == intersect/union built-ins on random sorted sets") {
    graft.plans.SortedJaccard.register(spark)
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    // random distinct token sets incl. empty-overlap, full-overlap,
    // subset, and single-element shapes
    val rows = (0 until 500).map { i =>
      val vocab = (0 until 30).map(j => s"t$j")
      def set() = rnd.shuffle(vocab).take(1 + rnd.nextInt(12)).toSeq
      val a = if (i % 17 == 0) Seq("t0") else set()
      val b = if (i % 13 == 0) a else set()
      (a, b)
    }
    val df = rows.toDF("a", "b")
      .select(sort_array(col("a")).as("a"), sort_array(col("b")).as("b"))
    val both = df.select(
      call_function("graft_jaccard", col("a"), col("b")).as("native"),
      (size(array_intersect(col("a"), col("b"))).cast("double")
        / size(array_union(col("a"), col("b")))).as("builtin"))
    assert(both.filter(col("native") =!= col("builtin")).count() == 0)
    // literal input constant-folds to a LocalTableScan (the expression
    // ran interpreted at optimization time — same eval path); the
    // codegen placement is asserted on the real verify plan instead
    assert(SparkEntry.queries("dedup_near_prefix")(spark, TestSpark.sfDir)
      .queryExecution.executedPlan.toString.contains("graft_jaccard"))
  }

  test("graft_char_counts == the HOF distinct-count form on real docs + edges") {
    graft.plans.CharCounts.register(spark)
    val docs = graft.core.Core.table(spark, TestSpark.sfDir, "documents")
      .select(col("text"))
    import spark.implicits._
    val edges = Seq("", " ", "aaa", "ab ba", "héllo œuvre", "汉字 汉",
      "a\tb\nc").toDF("text")
    Seq(docs, edges).foreach { df =>
      val both = df
        .withColumn("cs", filter(split(col("text"), ""), c => c =!= ""))
        .select(
          call_function("graft_char_counts", col("text")).as("native"),
          sort_array(transform(array_distinct(col("cs")),
            t => size(filter(col("cs"), x => x === t)).cast("double")))
            .as("hof"))
      assert(both.filter(not(col("native") <=> col("hof"))).count() == 0)
    }
  }

  test("graft_bytesum == per-byte hex fold on real UTF-8 frames") {
    graft.plans.ByteSum.register(spark)
    val d = graft.core.Core.table(spark, TestSpark.sfDir, "documents")
      .filter(length(col("text")) > 0)
      .withColumn("bf", encode(substring(col("text"), 1, 16), "UTF-8"))
      .withColumn("hx", lower(hex(col("bf"))))
    val both = d.select(
      call_function("graft_bytesum", col("bf")).as("native"),
      aggregate(
        sequence(lit(1), octet_length(col("bf"))), lit(0L),
        (acc, i) => acc +
          conv(substr(col("hx"), i * 2 - 1, lit(2)), 16, 10).cast("long"))
        .as("hof"))
    assert(both.filter(col("native") =!= col("hof")).count() == 0)
    assert(both.count() > 0)
  }

  test("dedup_near_prefix still equals dedup_near after the merge-Jaccard swap") {
    val dir = TestSpark.sfDir
    val a = SparkEntry.queries("dedup_near")(spark, dir)
      .collect().map(_.toSeq).toSeq
    val b = SparkEntry.queries("dedup_near_prefix")(spark, dir)
      .collect().map(_.toSeq).toSeq
    assert(a == b)
    assert(a.nonEmpty)
  }
}
