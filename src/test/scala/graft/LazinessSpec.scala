package graft

import org.scalatest.funsuite.AnyFunSuite

/** Systemic laziness guarantee: constructing ANY contract query must
  * not execute data. The only jobs allowed at build time are the
  * single-stage parquet-footer reads schema inference launches — a
  * multi-stage job during construction means a builder ran an eager
  * action (the round-1 dedup_near defect, now a regression guard for
  * all 86 queries). */
class LazinessSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  /** The one sanctioned exception: dedup_near_auto's plan choice runs a
    * single BOUNDED sampled-df statistic job at build time (limit 2048
    * docs regardless of corpus size — an AQE-style runtime stat,
    * documented in DedupOps.dedupNearAuto). Everything else stays
    * zero-job. */
  private val boundedStatQueries = Set("dedup_near_auto")

  test("every contract query builds without a multi-stage job") {
    val tracker = spark.sparkContext.statusTracker
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val before = tracker.getJobIdsForGroup(null).toSet
        fn(spark, TestSpark.sfDir)
        val jobs = tracker.getJobIdsForGroup(null).toSet -- before
        val multiStage = jobs.flatMap(j => tracker.getJobInfo(j))
          .filter(_.stageIds().length > 1)
        val allowed = if (boundedStatQueries(name)) 1 else 0
        if (multiStage.size > allowed) Some(name -> multiStage.size)
        else None
    }
    assert(offenders.isEmpty,
      s"eager multi-stage jobs at build time: $offenders")
  }
}
