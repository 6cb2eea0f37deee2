package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.core.Core

/** The scan-parallelism floor (Core.scanParallel, optimization round
  * 17): a small single-row-group parquet table serializes its whole
  * pre-exchange segment onto the few natural scan splits, so
  * Core.table inserts one round-robin exchange — but ONLY inside its
  * gates (table allow-list, byte caps), because the exchange is pure
  * overhead where the downstream per-row work is cheap (measured on
  * the full bench: OPTIMIZATION_r17.md). These tests pin the gates. */
class CoreScanSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val dir = TestSpark.sfDir

  private def hasRoundRobin(df: org.apache.spark.sql.DataFrame): Boolean =
    df.queryExecution.executedPlan.toString.contains("RoundRobinPartitioning")

  private def withConfs[T](kvs: (String, String)*)(body: => T): T =
    kvs.foldRight(() => body)((kv, acc) =>
      () => Core.withConf(spark, kv._1, kv._2)(acc())
    )()

  test("default gates: sf0.001 documents sits under the 64 KB floor — no exchange") {
    assert(!hasRoundRobin(Core.table(spark, dir, "documents")),
      "repartition fired below parallelizeMinBytes")
  }

  test("named table over the byte floor gets exactly one round-robin exchange; " +
      "other tables never do") {
    withConfs("spark.graft.scan.parallelizeMinBytes" -> "1") {
      assert(hasRoundRobin(Core.table(spark, dir, "documents")),
        "documents scan did not parallelize once over the byte floor")
      assert(!hasRoundRobin(Core.table(spark, dir, "lineitem")),
        "a table outside spark.graft.scan.parallelizeTables was repartitioned")
    }
  }

  test("the allow-list is a conf, not a constant") {
    withConfs("spark.graft.scan.parallelizeMinBytes" -> "1",
        "spark.graft.scan.parallelizeTables" -> "lineitem") {
      assert(hasRoundRobin(Core.table(spark, dir, "lineitem")))
      assert(!hasRoundRobin(Core.table(spark, dir, "documents")))
    }
  }

  test("the large-input cap disables the exchange (the 100 TB regime: " +
      "natural splits already scan wide)") {
    withConfs("spark.graft.scan.parallelizeMinBytes" -> "1",
        "spark.graft.scan.parallelizeMaxBytes" -> "2") {
      assert(!hasRoundRobin(Core.table(spark, dir, "documents")),
        "repartition fired past parallelizeMaxBytes")
    }
  }

  test("result identity: the exchange moves rows, never changes them") {
    val off = Core.table(spark, dir, "documents")
      .selectExpr("doc_id", "lang", "source").collect()
      .map(_.toString).sorted
    val on = withConfs("spark.graft.scan.parallelizeMinBytes" -> "1") {
      Core.table(spark, dir, "documents")
        .selectExpr("doc_id", "lang", "source").collect()
        .map(_.toString).sorted
    }
    assert(on.sameElements(off))
  }
}
