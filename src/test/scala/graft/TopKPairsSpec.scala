package graft

import graft.plans.GraftFunctions
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.IntegerType
import org.scalatest.funsuite.AnyFunSuite

/** The bounded partial top-K aggregate must reproduce the rank-window
  * form EXACTLY — rows, order within a group, and tie handling — because
  * sim_pq_topk's DuckDB oracle replays the window semantics. The heap
  * path differs per partitioning (partial buffers merge in task order),
  * so the property is asserted across partition counts and adversarial
  * tie-heavy inputs. */
class TopKPairsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def windowTopK(df: org.apache.spark.sql.DataFrame,
      k: Int): Seq[(Long, Int, Long, Long)] = {
    val byG = Window.partitionBy("g")
      .orderBy(col("score").desc, col("id").asc)
    df.withColumn("rank", row_number().over(byG))
      .filter(col("rank") <= k)
      .select(col("g"), col("rank").cast(IntegerType).as("rank"),
        col("id"), col("score"))
      .orderBy("g", "rank")
      .collect().toSeq
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
  }

  private def aggTopK(df: org.apache.spark.sql.DataFrame,
      k: Int): Seq[(Long, Int, Long, Long)] = {
    df.groupBy(col("g"))
      .agg(call_function("graft_topk_pairs",
        col("score"), col("id"), lit(k)).as("tk"))
      .select(col("g"), posexplode(col("tk")).as(Seq("pos", "e")))
      .select(col("g"), (col("pos") + 1).cast(IntegerType).as("rank"),
        col("e").getField("id").as("id"),
        col("e").getField("score").as("score"))
      .orderBy("g", "rank")
      .collect().toSeq
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
  }

  test("graft_topk_pairs == rank window on random tie-heavy streams, " +
      "across partitionings and k") {
    GraftFunctions.register(spark)
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    // scores drawn from a SMALL domain so cross-id ties are common
    // (the id tiebreak is the property under test), group sizes from
    // 0-ish to far past k, ids unique per group (the pqTopK contract)
    val rows = (0L until 40L).flatMap { g =>
      val n = rnd.nextInt(30)
      (0 until n).map(i => (g, i.toLong * 7 % 1000, rnd.nextInt(5).toLong - 2))
    }
    for (parts <- Seq(1, 3, 8); k <- Seq(1, 3, 10)) {
      val df = rows.toDF("g", "id", "score").repartition(parts)
      assert(aggTopK(df, k) == windowTopK(df, k),
        s"mismatch at parts=$parts k=$k")
    }
  }

  test("graft_topk_pairs ignores null scores and handles empty groups") {
    GraftFunctions.register(spark)
    import spark.implicits._
    val df = Seq[(Long, java.lang.Long, java.lang.Long)](
      (0L, 1L, null), (0L, 2L, 5L), (0L, 3L, 5L), (1L, 4L, null))
      .toDF("g", "id", "score")
    val out = df.groupBy(col("g"))
      .agg(call_function("graft_topk_pairs",
        col("score"), col("id"), lit(3)).as("tk"))
      .select(col("g"), size(col("tk")).as("n"))
      .collect().map(r => (r.getLong(0), r.getInt(1))).toMap
    // group 0: two non-null scores survive, tie broken by id asc
    assert(out == Map(0L -> 2, 1L -> 0))
    val ids = df.groupBy(col("g"))
      .agg(call_function("graft_topk_pairs",
        col("score"), col("id"), lit(3)).as("tk"))
      .filter(col("g") === 0)
      .select(explode(col("tk").getField("id")))
      .collect().map(_.getLong(0)).toSeq
    assert(ids == Seq(2L, 3L))
  }

  test("graft_topk_pairs rejects non-literal k and wrong types") {
    GraftFunctions.register(spark)
    import spark.implicits._
    val df = Seq((1L, 2L)).toDF("id", "score")
    val e1 = intercept[Exception] {
      df.agg(call_function("graft_topk_pairs",
        col("score"), col("id"), col("id"))).collect()
    }
    assert(e1.getMessage.contains("graft_topk_pairs"), e1.getMessage)
    val e2 = intercept[Exception] {
      Seq(("a", 1L)).toDF("s", "id").groupBy()
        .agg(call_function("graft_topk_pairs",
          col("s"), col("id"), lit(3))).collect()
    }
    assert(e2.getMessage.contains("graft_topk_pairs")
      || e2.getMessage.contains("DATATYPE_MISMATCH"), e2.getMessage)
  }

  test("pqTopK and ivfpqTopK plan the bounded aggregate, not a rank " +
      "window") {
    GraftFunctions.register(spark)
    for (df <- Seq(
        operators.SimilarityOps.pqTopK(spark, TestSpark.sfDir),
        operators.SimilarityOps.ivfpqTopK(spark, TestSpark.sfDir))) {
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("graft_topk_pairs"), plan.take(2000))
      assert(!plan.contains("WindowGroupLimit"), plan.take(2000))
      assert(!plan.contains("Window "), plan.take(2000))
      graft.core.Core.releaseShared()
    }
  }
}
