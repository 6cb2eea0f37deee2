package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm the JVM/session once (codegen, parquet reader, shuffle paths)
    // so the first measured query isn't charged Spark's startup cost.
    try {
      spark.range(1000000).selectExpr("sum(id)").collect()
      spark.read.parquet(s"$sfDir/region.parquet").count()
    } catch { case _: Throwable => }
    // Evaluate to a noop sink, not .count(): under count() Catalyst
    // prunes every unreferenced projection (formatting, hashing, HOFs)
    // and EliminateSorts drops the contract's total-order sorts, so
    // count-based timings understate expression-heavy queries. The noop
    // sink forces full evaluation of every output column — the same
    // work Verify's parquet dump pays, minus the IO.
    val timed = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      // per-query isolation: drop caches and collect garbage so one
      // allocation-heavy query can't tax its successors' timings
      spark.catalog.clearCache()
      System.gc()
      val t0 = System.nanoTime()
      val ok =
        try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); true }
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
          false
        }
      val sec = (System.nanoTime() - t0) / 1e9
      // a failed query must never read as a fast one: record -1, not
      // its time-to-failure, and list it under "errors"
      (name, if (ok) sec else -1.0, ok)
    }
    val qs = timed.map { case (k, v, _) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val errors = timed.collect { case (k, _, false) => "\"" + k + "\"" }
      .mkString("[", ",", "]")
    val total = timed.collect { case (_, v, true) => v }.sum
    val line =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errors,"sf":"$sfDir"}"""
    println(line)
    // self-archive: the driver's BENCH_r{N}.json has truncated its tail
    // both rounds (30+ per-query timings lost each time), so persist
    // the full line locally — latest snapshot + append-only history.
    try {
      java.nio.file.Files.write(java.nio.file.Paths.get("BENCH_SELF.json"),
        (line + "\n").getBytes("UTF-8"))
      java.nio.file.Files.write(java.nio.file.Paths.get("docs/bench_history.jsonl"),
        (s"""{"at":${System.currentTimeMillis / 1000},"bench":$line}""" + "\n")
          .getBytes("UTF-8"),
        java.nio.file.StandardOpenOption.CREATE,
        java.nio.file.StandardOpenOption.APPEND)
    } catch { case _: Throwable => } // archival must never fail the bench
    spark.stop()
  }
}
