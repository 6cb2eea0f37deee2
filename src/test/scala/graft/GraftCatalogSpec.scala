package graft

import graft.core.GraftCatalog
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The raw-SQL surface: one registerViews call makes the corpus and
  * the native functions available to spark.sql. */
class GraftCatalogSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("registerViews exposes all tables and graft_dot to raw SQL") {
    GraftCatalog.registerViews(spark, TestSpark.sfDir)
    // every table resolves
    GraftCatalog.tables.foreach { t =>
      assert(spark.sql(s"SELECT * FROM $t LIMIT 1").collect().length == 1, t)
    }
    // a multi-table SQL join matches the DataFrame API result
    val viaSql = spark.sql(
      """SELECT n_name, CAST(COUNT(*) AS BIGINT) AS n
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name ORDER BY n_name""".stripMargin)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toSeq
    val viaApi = graft.core.Core.table(spark, TestSpark.sfDir, "customer")
      .join(graft.core.Core.table(spark, TestSpark.sfDir, "nation"),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy("n_name").agg(count(lit(1)).as("n"))
      .orderBy("n_name")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toSeq
    assert(viaSql == viaApi)
    // the native codegen'd expression is callable from SQL
    val dot = spark.sql(
      """SELECT graft_dot(CAST(embedding AS ARRAY<DOUBLE>),
        |                 CAST(embedding AS ARRAY<DOUBLE>)) AS d
        |FROM embeddings ORDER BY vec_id LIMIT 1""".stripMargin)
      .collect().head.getDouble(0)
    assert(dot > 0.0)
    // events.ts came through the nanos rebuild as a usable timestamp
    val y = spark.sql("SELECT year(ts) FROM events LIMIT 1")
      .collect().head.getInt(0)
    assert(y >= 2020)
  }
}
