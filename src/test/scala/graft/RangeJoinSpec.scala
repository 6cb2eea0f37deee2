package graft

import graft.core.Core._
import graft.operators._
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The binned interval join, the deterministic split assignment, and
  * incremental dedup — identity/invariant checks on sf0.001 (the
  * DuckDB oracle re-checks all three exactly at sf0.01). */
class RangeJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val dir = TestSpark.sfDir

  test("join_interval equals the naive inequality self-join") {
    val binned = SparkEntry.queries("join_interval")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

    val e = table(spark, dir, "events")
      .select(col("event_id"), col("user_id"),
        unix_micros(col("ts")).as("us"))
    val naive = e.as("a")
      .join(e.as("b"),
        col("a.user_id") === col("b.user_id")
          && col("a.event_id") < col("b.event_id")
          && abs(col("a.us") - col("b.us")) <= RelationalOps.IntervalJoinUs)
      .select(col("a.event_id"), col("b.event_id"),
        abs(col("a.us") - col("b.us")))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

    assert(naive.nonEmpty, "corpus should contain close event pairs")
    assert(binned == naive,
      s"binned=${binned.size} naive=${naive.size}, " +
        s"missing=${(naive -- binned).take(3)}, extra=${(binned -- naive).take(3)}")
  }

  test("txt_split_assign is a stable 90/5/5 partition of the corpus") {
    val rows = SparkEntry.queries("txt_split_assign")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2)))
    val n = table(spark, dir, "documents").count()
    assert(rows.length == n, "exactly one split row per document")
    // split follows the bucket boundaries
    rows.foreach { case (id, b, s) =>
      assert(b >= 0 && b < 100, s"doc $id bucket $b out of range")
      val expected =
        if (b < TextOps.SplitTrainPct) "train"
        else if (b < TextOps.SplitValPct) "val" else "test"
      assert(s == expected, s"doc $id bucket $b got $s")
    }
    // quotas land near 90/5/5 (hash is uniform; wide tolerance keeps
    // the test corpus-size independent)
    val frac = rows.groupBy(_._3).view.mapValues(_.length.toDouble / n).toMap
    assert(frac("train") > 0.8 && frac("train") < 0.97, frac.toString)
    assert(frac.getOrElse("val", 0.0) < 0.12 && frac.getOrElse("test", 0.0) < 0.12,
      frac.toString)
  }

  test("dedup_incremental matches a naive batch-vs-corpus Jaccard scan") {
    val d = table(spark, dir, "documents")
      .withColumn("src_idx", substring(col("source"), 4, 10).cast("int"))
      .withColumn("toks", array_distinct(split(lower(col("text")), " ")))
    val corpus = d.filter(col("src_idx") < DedupOps.IncrementalCorpusSrcs)
      .select(col("lang"), col("doc_id").as("c_id"), col("toks").as("c_toks"))
    // naive reference: per batch doc, min corpus doc with Jaccard >= 0.6
    val expected = d.filter(col("src_idx") >= DedupOps.IncrementalCorpusSrcs)
      .select(col("lang"), col("doc_id"), col("toks"))
      .join(corpus, "lang")
      .filter(size(array_intersect(col("toks"), col("c_toks")))
        .cast("double") / size(array_union(col("toks"), col("c_toks"))) >= 0.6)
      .groupBy("doc_id").agg(min(col("c_id")).as("dup_of"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

    val batchN = d.filter(col("src_idx") >= DedupOps.IncrementalCorpusSrcs).count()
    val out = SparkEntry.queries("dedup_incremental")(spark, dir).collect()
    assert(out.length == batchN, "one decision row per batch doc")
    assert(out.exists(!_.getBoolean(3)) && out.exists(_.getBoolean(3)),
      "corpus should exercise both dup and new outcomes")
    out.foreach { r =>
      val (id, isNew) = (r.getLong(0), r.getBoolean(3))
      assert(isNew == !expected.contains(id),
        s"doc $id is_new=$isNew disagrees with naive scan")
      if (!isNew) assert(r.getLong(2) == expected(id),
        s"doc $id dup_of=${r.getLong(2)} expected ${expected(id)}")
      else assert(r.isNullAt(2), s"doc $id new but dup_of set")
    }
  }
}
