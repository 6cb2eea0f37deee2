package graft

import graft.sources.DisplaySink
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class DisplaySinkSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("frames partition by icon, compress, round-trip, and prune") {
    val out = java.nio.file.Files.createTempDirectory("frames").toString
    val frames = SparkEntry.queries("sink_display")(spark, TestSpark.sfDir)
    val n = frames.count()
    DisplaySink.writeFrames(frames, out)

    val dirs = new java.io.File(out).listFiles().map(_.getName)
      .filter(_.startsWith("icon=")).sorted
    assert(dirs.contains("icon=rain") && dirs.contains("icon=unknown"), dirs.toSeq)

    val back = spark.read.parquet(out)
    assert(back.count() == n)
    // partition pruning: reading one icon touches only its directory
    val rain = back.filter(col("icon") === "rain")
    val plan = rain.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(icon"), plan)
    assert(rain.count() ==
      frames.filter(col("icon") === "rain").count())
  }
}
