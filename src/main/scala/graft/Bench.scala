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
    // Warm the JVM/session once so no measured query is charged Spark's
    // startup cost. A trivial range-sum is NOT enough: profiling showed
    // the first query in a fresh JVM runs its stages 3-20x slow
    // (interpreter/C1 execution of the whole SQL runtime — UnsafeRow,
    // shuffle writers, codegen infra), and under the alphabetical bench
    // that tax lands on whichever queries run first. Exercise the paths
    // the contract queries live on — parquet scan, string split +
    // explode, shuffle join, hash aggregate, window, global sort, noop
    // sink — over synthetic data, then drop all state.
    try {
      spark.read.parquet(s"$sfDir/region.parquet").count()
      import org.apache.spark.sql.functions._
      import org.apache.spark.sql.expressions.Window
      val w = spark.range(200000).selectExpr(
        "id % 20011 AS k",
        "concat('tok', id % 31, ' tok', (id + 7) % 31) AS t",
        "CAST(id AS DOUBLE) AS x")
      val e = w.select(col("k"), col("x"),
        explode(array_distinct(split(col("t"), " "))).as("tok"))
      e.join(e.select(col("k"), col("tok"), col("x").as("y")),
          Seq("k", "tok"))
        .groupBy("k")
        .agg(count(lit(1)).as("c"), sum(col("x") * col("y")).as("s"))
        .withColumn("r",
          row_number().over(Window.partitionBy(col("k") % 13)
            .orderBy(col("s").desc)))
        .orderBy("k")
        .write.format("noop").mode("overwrite").save()
      spark.catalog.clearCache()
    } catch { case _: Throwable => }
    // Evaluate to a noop sink, not .count(): under count() Catalyst
    // prunes every unreferenced projection (formatting, hashing, HOFs)
    // and EliminateSorts drops the contract's total-order sorts, so
    // count-based timings understate expression-heavy queries. The noop
    // sink forces full evaluation of every output column — the same
    // work Verify's parquet dump pays, minus the IO.
    val timed = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      // per-query isolation: drop graft-registered persists, then any
      // remaining cache entries, and collect garbage so one
      // allocation-heavy query can't tax its successors' timings
      graft.core.Core.releaseShared()
      spark.catalog.clearCache()
      System.gc()
      // Drain the JIT compile queue before timing: each query's
      // codegen classes are compiled ASYNCHRONOUSLY, so a query that
      // finishes while C1/C2 are still churning leaves a backlog that
      // steals compiler/CPU time from its successor — and, worse, the
      // successor's own hot stage then starts INTERPRETED because its
      // compiles sit behind the backlog (the documented 4-5x
      // interpreted-codegen mechanism, docs/BENCH_NOTES.md round 4b).
      // Alphabetical neighbors made this composition-dependent:
      // adding one heavy query measurably inflated the NEXT dedup
      // query's time. Waiting until cumulative compilation time is
      // quiet (200 ms unchanged, 10 s cap) isolates each query's
      // measurement from its predecessor's compile debt — the same
      // per-query isolation the cache clear + GC above provide.
      val jit = java.lang.management.ManagementFactory.getCompilationMXBean
      var lastCt = -1L
      var spins = 0
      while (jit.getTotalCompilationTime != lastCt && spins < 50) {
        lastCt = jit.getTotalCompilationTime
        Thread.sleep(200)
        spins += 1
      }
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
