package graft

import org.scalatest.funsuite.AnyFunSuite

/** Hand-checked BPE semantics (graft.operators.TextOps.bpeTrainOf):
  * frequency-weighted pair counts, (count desc, pair asc) tiebreaks,
  * greedy left-to-right merging, and exhaustion safety — the properties
  * the DuckDB oracle alone can't localize when they break. */
class BpeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("merge sequence matches the hand-computed BPE on a tiny corpus") {
    import spark.implicits._
    // histogram: abab ×2, ab ×1. Round 1: pair (a,b) counts 2·2+1 = 5,
    // (b,a) counts 2 → merge 'ab'. Round 2: only (ab,ab) = 2 remains →
    // merge 'abab'. Rounds 3..8: every word is one symbol — exhausted,
    // the argmax relation is empty and no further merge rows appear.
    val docs = Seq("abab ab", "abab").toDF("text")
    val (words, merges) = graft.operators.TextOps.bpeTrainOf(docs)
    val m = merges.orderBy("round").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(m.toSeq == Seq((1, "a", "b", 5L), (2, "ab", "ab", 2L)))
    // exhaustion leaves the word relation INTACT (the merge step is a
    // LEFT join against the possibly-empty argmax — a plain cross join
    // would erase the vocabulary and with it every later encode)
    val w = words.collect().map(r => r.getString(0) -> r.getString(2)).toMap
    assert(w == Map("abab" -> " abab ", "ab" -> " ab "))
  }

  test("overlapping pair merges are greedy left-to-right, not simultaneous") {
    import spark.implicits._
    // 'aaaa aaa aa' (one doc, each word once). Round 1: (a,a) occurs
    // 3+2+1 = 6 times; greedy merge gives aaaa→[aa,aa], aaa→[aa,a]
    // (NEVER [aa,aa] — the shared middle 'a' is consumed), aa→[aa].
    // Round 2: (aa,aa)=1 vs (aa,a)=1 tie → pair-asc picks (aa,a) →
    // 'aaa'. Round 3: (aa,aa)=1 → 'aaaa'. Then exhausted.
    val docs = Seq("aaaa aaa aa").toDF("text")
    val (words, merges) = graft.operators.TextOps.bpeTrainOf(docs)
    val m = merges.orderBy("round").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(m.toSeq == Seq((1, "a", "a", 6L), (2, "aa", "a", 1L),
      (3, "aa", "aa", 1L)))
    val w = words.collect().map(r => r.getString(0) -> r.getString(2)).toMap
    assert(w == Map("aaaa" -> " aaaa ", "aaa" -> " aaa ", "aa" -> " aa "))
  }

  test("rule-based encode equals the vocab-join fast path on the training corpus") {
    // bpeEncodeByRules re-derives every word's segmentation from the
    // merge rules; bpeEncodeOf memoizes it through the trained words
    // relation. On the training corpus (where every word is in-vocab
    // by construction) the two must be IDENTICAL — the equality that
    // licenses the fast path for the contract query while the
    // streaming path uses rules (OOV-safe).
    val dir = TestSpark.sfDir
    val docs = graft.core.Core.table(spark, dir, "documents")
    val (words, merges) = graft.operators.TextOps.bpeTrainOf(docs)
    val fast = graft.operators.TextOps.bpeEncodeOf(docs, words)
      .collect().map(_.toSeq).toSeq
    val ruled = graft.operators.TextOps.bpeEncodeByRules(docs, merges)
      .collect().map(_.toSeq).toSeq
    assert(fast == ruled)
  }

  test("contract corpus: full merge table, non-increasing counts, encode bounds") {
    val dir = TestSpark.sfDir
    val vocab = SparkEntry.queries("txt_bpe_vocab")(spark, dir).collect()
    assert(vocab.length == graft.operators.TextOps.BpeRounds,
      "the contract corpus must not exhaust inside the round budget")
    // argmax counts never increase round-over-round: a post-merge pair
    // (xy, z) occurs at most as often as (y, z) did pre-merge
    val counts = vocab.sortBy(_.getInt(0)).map(_.getLong(4))
    assert(counts.zip(counts.tail).forall { case (a, b) => b <= a })
    // encode: every word segments to >= 1 and <= len(word) subwords
    val enc = SparkEntry.queries("txt_bpe_encode")(spark, dir).collect()
    val docs = graft.core.Core.table(spark, dir, "documents")
      .selectExpr("doc_id",
        "size(split(lower(text), ' ')) AS nw",
        "aggregate(split(lower(text), ' '), 0, (a, w) -> a + length(w)) AS nc")
      .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2)))).toMap
    assert(enc.length == docs.size)
    enc.foreach { r =>
      val (nw, nc) = docs(r.getLong(0))
      assert(r.getLong(1) == nw.toLong, s"doc ${r.getLong(0)} word count")
      assert(r.getLong(2) >= nw && r.getLong(2) <= nc,
        s"doc ${r.getLong(0)} subword bounds")
    }
  }
}
