package graft

import graft.operators.DedupOps
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The theorem-based plan rewrites (prefix filtering, banded SimHash)
  * must hold on ANY corpus, not just the driver testdata. Three seeded
  * synthetic corpora stress the edge cases the real corpus doesn't:
  * singleton-token docs, exact duplicates, disjoint docs, skewed token
  * frequencies. */
class RandomizedParitySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  /** Deterministic pseudo-random corpus: `n` docs over a vocab of
    * `vocab` tokens with zipf-ish reuse; a few exact dups and
    * singletons mixed in. */
  private def corpus(seed: Int, n: Int, vocab: Int): String = {
    import spark.implicits._
    val rnd = new scala.util.Random(seed)
    val words = (0 until vocab).map(i => s"w$i")
    val docs = (0 until n).map { i =>
      val len = 1 + rnd.nextInt(8)
      val toks = Seq.fill(len)(words(
        // skew: low ids much more frequent
        math.min(vocab - 1, (math.abs(rnd.nextGaussian()) * vocab / 3).toInt)))
      val text =
        if (i % 11 == 0 && i > 0) null // replaced below by a dup
        else toks.mkString(" ")
      (i.toLong, text, "en", s"s${i % 2}", 0L)
    }
    // every 11th doc duplicates its predecessor exactly (text AND
    // source, so the pair lands in the same block)
    val fixed = docs.map {
      case (id, null, l, _, nc) =>
        val prev = docs((id - 1).toInt)
        (id, prev._2, l, prev._4, nc)
      case d => d
    }
    val dir = java.nio.file.Files
      .createTempDirectory(s"graft_rand$seed").toString
    fixed.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("prefix-filtered join == unfiltered join on random corpora " +
    "(with and without the positional rank bound)") {
    for (seed <- Seq(1, 2, 3)) {
      val dir = corpus(seed, n = 60, vocab = 40)
      val full = DedupOps.dedupNearRelational(spark, dir)
        .collect().map(_.toSeq).toSeq
      val pref = DedupOps.dedupNearPrefix(spark, dir)
        .collect().map(_.toSeq).toSeq
      assert(pref == full, s"seed=$seed")
      val positional = DedupOps.dedupNearPrefix(spark, dir, positional = true)
        .collect().map(_.toSeq).toSeq
      assert(positional == full, s"seed=$seed (positional)")
      assert(full.nonEmpty, s"seed=$seed produced no pairs — weak test")
    }
  }

  test("banded SimHash == all-pairs on random corpora") {
    for (seed <- Seq(4, 5)) {
      val dir = corpus(seed, n = 60, vocab = 40)
      val banded = DedupOps.queries("dedup_simhash")(spark, dir)
        .collect().map(_.toSeq).toSeq
      val d = graft.core.Core.table(spark, dir, "documents")
        .select("doc_id", "source")
        .join(DedupOps.simhashSketches(spark, dir), "doc_id")
      val a = d.select(col("source"), col("doc_id").as("a_id"),
        col("simhash").as("a_sh"))
      val b = d.select(col("source"), col("doc_id").as("b_id"),
        col("simhash").as("b_sh"))
      val allPairs = a.join(b, Seq("source"))
        .filter(col("a_id") < col("b_id"))
        .withColumn("hamming",
          bit_count(col("a_sh").bitwiseXOR(col("b_sh"))).cast("int"))
        .filter(col("hamming") <= 10)
        .select("a_id", "b_id", "hamming")
        .orderBy("a_id", "b_id")
        .collect().map(_.toSeq).toSeq
      assert(banded == allPairs, s"seed=$seed")
      assert(allPairs.nonEmpty, s"seed=$seed produced no pairs — weak test")
    }
  }
}
