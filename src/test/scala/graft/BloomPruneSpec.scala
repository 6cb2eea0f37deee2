package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Runtime bloom-filter join pruning: with
  * spark.sql.optimizer.runtime.bloomFilter.enabled, Catalyst injects a
  * BloomFilterMightContain predicate on the large side of a shuffle
  * join when the other side carries a selective filter — rows that
  * cannot match are dropped at the scan, before the shuffle. This is
  * the 100 TB lever for fact⋈filtered-dim joins that are too large to
  * broadcast. */
class BloomPruneSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("selective dim filter injects a bloom filter on the fact side") {
    // capture-and-restore EVERY conf this test touches: the session is
    // JVM-wide shared across suites, and leaked bloom thresholds would
    // make other suites' plan-shape assertions order-dependent
    val touched = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
      "spark.sql.autoBroadcastJoinThreshold")
    val prev: Map[String, Option[String]] =
      touched.map(k => k -> spark.conf.getOption(k)).toMap
    spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    spark.conf.set(
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "1GB")
    spark.conf.set(
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
    // disable broadcast so the join actually shuffles (the bloom filter
    // targets shuffle joins; broadcast joins prune via the hash table)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val fact = graft.core.Core.table(spark, TestSpark.sfDir, "lineitem")
      val dim = graft.core.Core.table(spark, TestSpark.sfDir, "orders")
        .filter(col("o_orderpriority") === "1-URGENT")
      val joined = fact.join(dim, col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderpriority").agg(count(lit(1)).as("n"))
      val optimized = joined.queryExecution.optimizedPlan.toString
      assert(optimized.contains("might_contain"),
        s"no bloom filter injected:\n$optimized")
      // and the result is unaffected by the pruning
      val n = joined.collect().map(_.getLong(1)).sum
      val expect = fact.join(
        graft.core.Core.table(spark, TestSpark.sfDir, "orders")
          .filter(col("o_orderpriority") === "1-URGENT"),
        col("l_orderkey") === col("o_orderkey")).count()
      assert(n == expect)
    } finally {
      prev.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None) => spark.conf.unset(k)
      }
    }
  }
}
