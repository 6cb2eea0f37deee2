package graft.core

import org.apache.spark.sql.SparkSession

/** One-call SQL surface: register every testdata table of an sf
  * directory as a temp view (through [[Core.table]], so the events
  * nanos-timestamp rebuild applies) plus the engine's native functions
  * — after this, the whole corpus is queryable with raw `spark.sql`,
  * including `graft_dot` for embedding work. */
object GraftCatalog {

  /** The driver testdata tables (TESTDATA.md). */
  val tables: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings")

  def registerViews(spark: SparkSession, dir: String): Unit = {
    graft.plans.GraftFunctions.register(spark)
    tables.foreach { t =>
      Core.table(spark, dir, t).createOrReplaceTempView(t)
    }
  }
}
