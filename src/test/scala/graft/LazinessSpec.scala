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

  test("every contract query builds without a multi-stage job") {
    // One documented exemption class: iterative TRAINING operators
    // (txt_bpe_*) materialize bounded per-round argmax state at build —
    // the MLlib iterative-estimator pattern (KMeans collects centers
    // every Lloyd round). Their jobs are 1-row TakeOrdered collects
    // over a cached vocabulary histogram, never corpus-scaled results;
    // see TextOps.bpeTrainOf for why the lazy alternatives are worse
    // (exponential plan growth / AQE eager checkpoint stages). Every
    // other query is zero-multi-stage-job at build (dedup_near_auto's
    // former stat job stays deferred via AQE empty-relation guards).
    // sim_ivfpq_topk trains two quantizers (IvfK coarse centroids +
    // PqM·PqK sub-centroids per Lloyd round) — same bounded-state
    // collect pattern; its fully-lazy form measured 2,671 broadcast
    // exchanges from multiplicative plan duplication
    // pipeline_dedup / pipeline_full: their global CC chain (ccDoubled,
    // StarCcPairs (P,S) pairs) is lineage-truncated after every pair
    // (lazy localCheckpoint — the `truncate` doc); planning a segment
    // under AQE materializes its upstream label stages at build. The
    // build-time jobs are labels-only (2 longs per doc, never text)
    // and replace an O(depth²) driver analysis term that measured
    // ~18 s per query on the pre-doubling 18-round linear chain.
    val exempt = Set("txt_bpe_vocab", "txt_bpe_vocab64", "txt_bpe_encode",
      "sim_ivfpq_topk",
      "pipeline_tokenize", "pipeline_dedup", "pipeline_full")
    val tracker = spark.sparkContext.statusTracker
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1)
      .filterNot(kv => exempt(kv._1)).flatMap {
      case (name, fn) =>
        val before = tracker.getJobIdsForGroup(null).toSet
        fn(spark, TestSpark.sfDir)
        val jobs = tracker.getJobIdsForGroup(null).toSet -- before
        val multiStage = jobs.flatMap(j => tracker.getJobInfo(j))
          .filter(_.stageIds().length > 1)
        if (multiStage.nonEmpty) Some(name -> multiStage.size)
        else None
    }
    assert(offenders.isEmpty,
      s"eager multi-stage jobs at build time: $offenders")
  }
}
