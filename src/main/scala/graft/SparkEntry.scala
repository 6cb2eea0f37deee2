package graft

import graft.core.Core._
import graft.functions.WeatherDims
import graft.operators._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    *
    * The full reference pipeline shape (/root/reference/weather.py) over
    * testdata: JSON-payload parse (≅ :73-83) → broadcast WMO lookup join
    * with default (≅ :92-114) → CASE-IN icon classification (≅ :117-130)
    * → 10-minute tumbling window (≅ the :24/:324-333 refresh loop) →
    * formatted display columns (≅ :268,301,306) → total-order sort.
    */
  def entry(spark: SparkSession): DataFrame = {
    val dir = "/root/testdata/sf0.001"
    val obs = WeatherDims.withDescription(spark, observations(spark, dir))
    obs
      .withColumn("icon", WeatherDims.iconCol(col("code")))
      .groupBy(window(col("ts"), "10 minutes").as("w"), col("icon"))
      .agg(
        count(lit(1)).as("n_obs"),
        (sum(cents(col("value"))) / 100.0).as("sum_temp"),
        max(col("description")).as("max_description"))
      .select(
        date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("window_start"),
        col("icon"), col("n_obs"),
        concat(pyFmt0f(col("sum_temp")), lit("°")).as("sum_temp_text"),
        col("max_description"))
      .orderBy("window_start", "icon")
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    ReferenceOps.queries ++ RelationalOps.queries ++ TextOps.queries ++
      DedupOps.queries ++ SimilarityOps.queries ++ MultimodalOps.queries ++
      SqlSuite.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    ReferenceOps.oracleSql ++ RelationalOps.oracleSql ++
      TextOps.oracleSql ++ DedupOps.oracleSql ++ SimilarityOps.oracleSql ++
      MultimodalOps.oracleSql ++ SqlSuite.oracleSql
}
