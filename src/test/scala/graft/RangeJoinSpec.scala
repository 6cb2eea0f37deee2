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

  test("binned interval join == naive join on adversarial random corpora") {
    // the adjacency/orientation argument (each qualifying pair survives
    // in EXACTLY one orientation, so no distinct) is subtle — exercise
    // it on random event sets that concentrate timestamps AROUND CELL
    // BOUNDARIES, where an off-by-one in the cell arithmetic would
    // duplicate or drop pairs
    import spark.implicits._
    val w = RelationalOps.IntervalJoinUs
    for (seed <- Seq(11, 12, 13)) {
      val rnd = new scala.util.Random(seed)
      val events = (0 until 300).map { i =>
        val user = rnd.nextInt(6).toLong
        // cluster at cell edges: k*w ± small jitter, plus some uniform
        val us =
          if (i % 3 == 0) rnd.nextInt(5).toLong * w + rnd.nextInt(3) - 1
          else math.abs(rnd.nextLong()) % (5 * w)
        (i.toLong, user, us)
      }
      val e = events.toDF("event_id", "user_id", "us")
      val cell = org.apache.spark.sql.functions.expr(s"us DIV $w")
      val a = e.select(col("user_id"), cell.as("cell"),
        col("event_id").as("x_id"), col("us").as("x_us"),
        cell.as("x_cell"))
      val b = e.select(col("user_id"),
        col("event_id").as("y_id"), col("us").as("y_us"),
        cell.as("y_cell"),
        explode(array(cell, cell + 1)).as("cell"))
      val binned = a.join(b, Seq("user_id", "cell"))
        .filter(abs(col("x_us") - col("y_us")) <= w)
        .filter(col("x_cell") > col("y_cell")
          || (col("x_cell") === col("y_cell") && col("x_id") < col("y_id")))
        .select(least(col("x_id"), col("y_id")),
          greatest(col("x_id"), col("y_id")))
        .collect().map(r => (r.getLong(0), r.getLong(1)))
      val naive = e.as("p").join(e.as("q"),
          col("p.user_id") === col("q.user_id")
            && col("p.event_id") < col("q.event_id")
            && abs(col("p.us") - col("q.us")) <= w)
        .select(col("p.event_id"), col("q.event_id"))
        .collect().map(r => (r.getLong(0), r.getLong(1)))
      assert(binned.length == naive.length,
        s"seed=$seed: orientation dedup broke (${binned.length} vs " +
          s"${naive.length} — duplicates or drops)")
      assert(binned.toSet == naive.toSet, s"seed=$seed")
      assert(naive.nonEmpty, s"seed=$seed produced no pairs — weak test")
    }
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
