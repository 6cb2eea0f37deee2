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
    // pipeline_dedup / pipeline_full: their global CC chain (ccDoubled
    // -> ccPsLoop since round 12) runs EAGERLY at build — per-segment
    // localCheckpoints + a fixpoint-certifying label-sum per segment,
    // AQE off for the loop's fixed-shape label joins. The build-time
    // jobs are labels-only (2 longs per doc, never text); the eager
    // loop replaced the lazy-truncated AQE chain whose per-segment
    // driver re-planning was the measured dominant manifest cost
    // (docs/PLANS.md round 12), and early-exits at the corpus's own
    // measured fixpoint (6 segments on the contract corpus vs the
    // 17-pair cap).
    // dedup_semdedup / sim_ann_ivf_rerank (round 13): the √n k-routing
    // decides its menu entry from ONE bounded count at build
    // (SimilarityOps.routedK — never reads past 204,800,001 rows). Same
    // bounded-state class as sim_ivfpq_topk's training collects; the
    // lazy guarded-union alternative measured +2.2 s per query at
    // sf0.1 because each dead branch carries a full Lloyd chain.
    // sim_ann_lsh_auto (round 15): the LSH->IVF FAMILY handoff runs
    // the same bounded count at build (annFamilyFor) — a lazy IVF arm
    // would carry a dead Lloyd chain into every LSH-regime plan. The
    // LSH-regime plan it returns below the ceiling is the same lazy
    // guarded union as before.
    // curate family (round 16): the fused-curate cache is SIZE-GATED
    // by one bounded count at build (TextOps.CurateFuseMaxDocs — the
    // scan never reads past 2M+1 rows): below the gate the pass
    // persists the grams arrays (one corpus scan for both branches),
    // above it only narrow funnel columns persist and the gram branch
    // rescans pruned. Same bounded-state class as routedK.
    // sim_pq_topk (round 16): flat-PQ sub-centroids now train via the
    // same bounded driver-side literal rounds as sim_ivfpq_topk
    // (pqCentroidsLit — the measured 5th decade retired the relational
    // chain's n·M exchanges); identical bounded-state rationale.
    // Round 17: the contract query additionally routes the FAMILY
    // (pqTopKAuto — flat PQ within the measured boundary, IVF-PQ past
    // it) via one more bounded count, the annFamilyFor convention.
    val exempt = Set("txt_bpe_vocab", "txt_bpe_vocab64", "txt_bpe_encode",
      "sim_pq_topk",
      "sim_ivfpq_topk", "dedup_semdedup", "sim_ann_ivf_rerank",
      "sim_ann_lsh_auto",
      "pipeline_tokenize", "pipeline_dedup", "pipeline_full",
      "pipeline_curate", "pipeline_stats", "pipeline_pack")
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
