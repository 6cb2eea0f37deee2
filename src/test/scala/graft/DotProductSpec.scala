package graft

import graft.plans.GraftFunctions
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The native codegen'd dot product must be bit-identical to the
  * higher-order-function sequential fold it replaces (that identity is
  * what keeps the DuckDB cosine oracles exact). */
class DotProductSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("graft_dot == zip_with/aggregate fold, bitwise, on real embeddings") {
    GraftFunctions.register(spark)
    val e = graft.core.Core.table(spark, TestSpark.sfDir, "embeddings")
      .select(col("vec_id"),
        col("embedding").cast("array<double>").as("v"))
    val both = e.select(
      col("vec_id"),
      call_function("graft_dot", col("v"), col("v")).as("native"),
      aggregate(zip_with(col("v"), col("v"), _ * _), lit(0.0d), _ + _)
        .as("hof"))
    val mismatches = both.filter(
      col("native") =!= col("hof")).count()
    assert(mismatches == 0)
    // and it's actually used via codegen: plan contains the expression
    assert(both.queryExecution.executedPlan.toString.contains("graft_dot"))
  }

  test("graft_dot rejects wrong input types") {
    GraftFunctions.register(spark)
    import spark.implicits._
    val bad = intercept[Exception] {
      Seq((Seq("a"), Seq("b"))).toDF("x", "y")
        .select(call_function("graft_dot", col("x"), col("y"))).collect()
    }
    assert(bad.getMessage.toLowerCase.contains("graft_dot")
      || bad.getMessage.contains("DATATYPE_MISMATCH"), bad.getMessage)
  }

  test("registration is idempotent and works via extensions class") {
    GraftFunctions.register(spark)
    GraftFunctions.register(spark)
    val r = spark.sql("SELECT graft_dot(array(1.0d, 2.0d), array(3.0d, 4.0d))")
      .head().getDouble(0)
    assert(r == 11.0)
  }

  test("graft_jaccard == intersect/union built-ins on random sorted sets") {
    graft.plans.SortedJaccard.register(spark)
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    // random distinct token sets incl. empty-overlap, full-overlap,
    // subset, and single-element shapes
    val rows = (0 until 500).map { i =>
      val vocab = (0 until 30).map(j => s"t$j")
      def set() = rnd.shuffle(vocab).take(1 + rnd.nextInt(12)).toSeq
      val a = if (i % 17 == 0) Seq("t0") else set()
      val b = if (i % 13 == 0) a else set()
      (a, b)
    }
    val df = rows.toDF("a", "b")
      .select(sort_array(col("a")).as("a"), sort_array(col("b")).as("b"))
    val both = df.select(
      call_function("graft_jaccard", col("a"), col("b")).as("native"),
      (size(array_intersect(col("a"), col("b"))).cast("double")
        / size(array_union(col("a"), col("b")))).as("builtin"))
    assert(both.filter(col("native") =!= col("builtin")).count() == 0)
    // literal input constant-folds to a LocalTableScan (the expression
    // ran interpreted at optimization time — same eval path); the
    // codegen placement is asserted on the real verify plan instead
    assert(SparkEntry.queries("dedup_near_prefix")(spark, TestSpark.sfDir)
      .queryExecution.executedPlan.toString.contains("graft_jaccard"))
  }

  test("graft_char_counts == the HOF distinct-count form on real docs + edges") {
    graft.plans.CharCounts.register(spark)
    val docs = graft.core.Core.table(spark, TestSpark.sfDir, "documents")
      .select(col("text"))
    import spark.implicits._
    val edges = Seq("", " ", "aaa", "ab ba", "héllo œuvre", "汉字 汉",
      "a\tb\nc").toDF("text")
    Seq(docs, edges).foreach { df =>
      val both = df
        .withColumn("cs", filter(split(col("text"), ""), c => c =!= ""))
        .select(
          call_function("graft_char_counts", col("text")).as("native"),
          sort_array(transform(array_distinct(col("cs")),
            t => size(filter(col("cs"), x => x === t)).cast("double")))
            .as("hof"))
      assert(both.filter(not(col("native") <=> col("hof"))).count() == 0)
    }
  }

  test("graft_winnow == the HOF winnowing form on edges + a fold on real docs") {
    graft.plans.Winnow.register(spark)
    val (k, w) = (graft.plans.Winnow.K, graft.plans.Winnow.W)
    val P = graft.functions.TextHash.P
    import spark.implicits._
    // HOF twin on SHORT strings only: each nested-lambda reference to
    // codes/gh re-expands the whole upstream transform after projection
    // collapse (O(m²·n) interpreted evals per row — minutes per
    // 600-char doc), which is exactly why the shipped query is the
    // native expression. Edges cover: < K (empty result), exactly K,
    // K..K+W-1 (single window), duplicate minima -> distinct,
    // non-ASCII code points, supplementary-plane chars.
    val edges = Seq("", "abc", "abcdefgh", "abcdefghij", "aaaaaaaaaaaa",
      "héllo œuvre une autre", "汉字汉字汉字汉字汉字").toDF("text")
    val both = edges
      .withColumn("codes", expr(
        "transform(filter(split(text, ''), c -> c <> ''), " +
          "c -> CAST(ascii(c) AS BIGINT))"))
      .withColumn("nc", size(col("codes")))
      .withColumn("gh", when(col("nc") >= k, expr(
        s"transform(sequence(1, nc - ${k - 1}), i -> " +
          s"aggregate(slice(codes, i, $k), CAST(0 AS BIGINT), " +
          s"(a, c) -> (a * 31 + c) % $P))"))
        .otherwise(expr("CAST(array() AS ARRAY<BIGINT>)")))
      .withColumn("m", size(col("gh")))
      .select(
        call_function("graft_winnow", col("text")).as("native"),
        when(col("m") >= 1, expr(
          s"array_distinct(transform(" +
            s"sequence(1, greatest(m - ${w - 1}, 1)), " +
            s"j -> array_min(slice(gh, j, $w))))"))
          .otherwise(expr("CAST(array() AS ARRAY<BIGINT>)")).as("hof"))
    assert(both.filter(not(col("native") <=> col("hof"))).count() == 0)
    // real docs: full fingerprint ARRAY (values AND first-occurrence
    // order) vs a driver-side fold of the same algorithm
    val docs = graft.core.Core.table(spark, TestSpark.sfDir, "documents")
      .select(col("doc_id"),
        call_function("graft_winnow", col("text")).as("fps"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    graft.core.Core.table(spark, TestSpark.sfDir, "documents")
      .select("doc_id", "text").collect().foreach { r =>
        val (id, text) = (r.getLong(0), r.getString(1))
        val codes = text.map(_.toLong)
        val gh =
          if (codes.length >= k)
            (0 to codes.length - k).map(i => codes.slice(i, i + k)
              .foldLeft(0L)((a, c) => (a * 31 + c) % P))
          else Seq.empty[Long]
        val expect =
          if (gh.isEmpty) Seq.empty[Long]
          else (0 until math.max(gh.length - w + 1, 1))
            .map(j => gh.slice(j, j + w).min).distinct
        assert(docs(id) == expect, s"doc $id")
      }
  }

  test("graft_tok_stats == the HOF repetition counts on real docs + edges") {
    graft.plans.TokStats.register(spark)
    import spark.implicits._
    // empties from consecutive/leading/trailing spaces are TOKENS
    // under split(s, " ") semantics; single token -> no bigrams
    val edges = Seq("", " ", "a", "a a", "a  b", " lead", "trail ",
      "a b a b a", "x y z").toDF("text")
    val docs = graft.core.Core.table(spark, TestSpark.sfDir, "documents")
      .select(lower(col("text")).as("text"))
    Seq(edges, docs).foreach { df =>
      val both = df
        .withColumn("toks", split(col("text"), " "))
        .withColumn("bg", expr(
          "transform(slice(toks, 1, greatest(size(toks) - 1, 0)), " +
            "(t, i) -> concat(t, ' ', toks[i + 1]))"))
        .select(
          call_function("graft_tok_stats", col("text")).as("native"),
          struct(
            size(col("toks")).as("n"),
            array_max(transform(array_distinct(col("toks")),
              t => size(filter(col("toks"), x => x === t))))
              .as("top_cnt"),
            size(col("bg")).as("n_bigrams"),
            size(array_distinct(col("bg"))).as("n_distinct_bigrams"))
            .as("hof"))
      assert(both.filter(not(col("native") <=> col("hof"))).count() == 0)
    }
  }

  test("graft_bytesum == per-byte hex fold on real UTF-8 frames") {
    graft.plans.ByteSum.register(spark)
    val d = graft.core.Core.table(spark, TestSpark.sfDir, "documents")
      .filter(length(col("text")) > 0)
      .withColumn("bf", encode(substring(col("text"), 1, 16), "UTF-8"))
      .withColumn("hx", lower(hex(col("bf"))))
    val both = d.select(
      call_function("graft_bytesum", col("bf")).as("native"),
      aggregate(
        sequence(lit(1), octet_length(col("bf"))), lit(0L),
        (acc, i) => acc +
          conv(substr(col("hx"), i * 2 - 1, lit(2)), 16, 10).cast("long"))
        .as("hof"))
    assert(both.filter(col("native") =!= col("hof")).count() == 0)
    assert(both.count() > 0)
  }

  test("dedup_near_prefix still equals dedup_near after the merge-Jaccard swap") {
    val dir = TestSpark.sfDir
    val a = SparkEntry.queries("dedup_near")(spark, dir)
      .collect().map(_.toSeq).toSeq
    val b = SparkEntry.queries("dedup_near_prefix")(spark, dir)
      .collect().map(_.toSeq).toSeq
    assert(a == b)
    assert(a.nonEmpty)
  }
}
