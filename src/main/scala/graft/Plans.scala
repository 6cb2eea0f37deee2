package graft

import org.apache.spark.sql.SparkSession

/** Plan snapshot tool: write `explain("formatted")` for named queries
  * (or all) to `<outDir>/<query><suffix>.txt` WITHOUT executing them —
  * the optimization rounds' before/after plan evidence
  * (plans/r17/<query>_before.txt / _after.txt). Planning only: no
  * actions run beyond the bounded build-time probes some queries
  * document (e.g. pqTopKAuto's routing count).
  *
  * Usage: runMain graft.Plans <outDir> <suffix> [q1 q2 ...]
  */
object Plans {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: Plans <outDir> <suffix> [queries...]")
    val outDir = java.nio.file.Paths.get(args(0))
    val suffix = args(1)
    val names =
      if (args.length > 2) args.drop(2).toSeq
      else SparkEntry.queries.keys.toSeq.sorted
    java.nio.file.Files.createDirectories(outDir)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      val txt =
        try fn(spark, sfDir).queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        catch { case e: Throwable => s"PLAN FAILED: ${e.getMessage}" }
      java.nio.file.Files.write(outDir.resolve(s"$name$suffix.txt"),
        txt.getBytes("UTF-8"))
      // per-query scope, mirroring Bench/Profile: a build-time persist
      // must not leak into the next query's plan
      graft.core.Core.releaseShared()
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
