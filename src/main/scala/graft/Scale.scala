package graft

import org.apache.spark.sql.SparkSession

/** Scale-evidence harness (docs/SCALE.md): measures the dedup family,
  * the ANN scale path and the interval join at sf0.1 and at 10x, under
  * the two growth regimes [[ScaleData]] generates (DENSE: same sources,
  * blocks x10, Sum k^2 model predicts ~100x candidate work; WIDE: 10x
  * sources, block size constant, model predicts ~10x). Per run it
  * records wall seconds plus the FINAL adaptive plan's broadcast-join
  * and broadcast-exchange counts — a strategy flip between sf0.1 and
  * sf1 (stats-driven broadcast of a corpus-scaled relation, the
  * round-3 failure mode) would show up as a count change even when the
  * timing happens to survive it.
  *
  * Usage: runMain graft.Scale [gen|sf0.1|dense|wide]...
  * (no args = gen + all three sweeps; results append to
  * docs/scale_results.jsonl and print as JSON lines).
  */
object Scale {

  private val DenseDir = "target/testdata/sf1dense"
  private val WideDir = "target/testdata/sf1wide"

  /** The full doc-corpus scale set (everything runs at sf0.1 and WIDE;
    * DENSE runs the subset below — at blocks x10 the ~100x members cost
    * minutes each, so DENSE keeps one representative per plan family). */
  private val docQueries = Seq(
    "dedup_exact", "txt_repetition", "txt_split_assign",
    "txt_unigram_logprob", "sample_temperature",
    "dedup_near", "dedup_near_prefix", "dedup_near_auto", "dedup_ngram",
    "txt_containment", "dedup_minhash_lsh", "dedup_minhash_est",
    "dedup_simhash", "dedup_simhash64",
    "dedup_cluster_cc", "dedup_canonical_pick", "dedup_incremental")

  /** DENSE subset: dedup_near_auto only re-picks a branch of near/
    * prefix, dedup_ngram/minhash_est/simhash share their families'
    * candidate plans, and dedup_canonical_pick is cluster_cc plus a
    * linear argmax — measuring one member per family bounds the sweep
    * without losing a growth model. */
  private val denseDocQueries = Seq(
    "dedup_exact", "txt_repetition", "txt_split_assign",
    "dedup_near", "dedup_near_prefix", "txt_containment",
    "dedup_minhash_lsh", "dedup_simhash64",
    "dedup_cluster_cc", "dedup_incremental")

  private val extraQueries: Map[String, core.Core.Q] = Map(
    // the documented bucket-sizing knob turned: at n=8000 vectors the
    // contract's 8 planes (256 buckets) leave occupancy ~31 and the
    // in-bucket pairing grows ~n^2/buckets; 12 planes (4096 buckets)
    // push occupancy down to ~2 — below the sf0.1 level of ~8 (10
    // planes would match it exactly), deliberately over-provisioned to
    // show the knob's full effect: near-flat cost at 4x the corpus for
    // 4 extra probe buckets per query
    "sim_ann_lsh_p12" -> ((s, dir) =>
      operators.SimilarityOps.annLsh(s, dir, nPlanes = 12)))

  private def queriesFor(tag: String): Seq[String] =
    (if (tag == "sf1dense") denseDocQueries else docQueries) ++
      Seq("sim_ann_lsh", "sim_ann_lsh_p12", "join_interval")

  def main(args: Array[String]): Unit = {
    val sel = if (args.isEmpty) Seq("gen", "sf0.1", "dense", "wide")
      else args.toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val ref = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    // capture each action's FINAL (post-AQE) physical plan, tagged with
    // the run sequence number current when the action STARTED — the
    // listener fires on the async bus, so an untagged capture could
    // belong to the previous query under bus lag (ADVICE round 5)
    val runSeq = new java.util.concurrent.atomic.AtomicLong(0)
    val lastPlan = new java.util.concurrent.atomic
      .AtomicReference[(Long, String)]((0L, ""))
    spark.listenerManager.register(
      new org.apache.spark.sql.util.QueryExecutionListener {
        override def onSuccess(f: String,
            qe: org.apache.spark.sql.execution.QueryExecution,
            ns: Long): Unit =
          lastPlan.set((runSeq.get(), qe.executedPlan.toString))
        override def onFailure(f: String,
            qe: org.apache.spark.sql.execution.QueryExecution,
            e: Exception): Unit = ()
      })

    // a corpus counts as generated only when ALL its tables COMMITTED —
    // Spark creates the output dir before job commit, so the dir alone
    // can exist for a killed-mid-write table; the _SUCCESS marker is
    // written at commit, making an interrupted generation regenerate
    // instead of shipping a partial corpus forever (ADVICE round 5)
    def complete(d: String): Boolean =
      Seq("documents", "embeddings", "events")
        .forall(t => new java.io.File(s"$d/$t.parquet/_SUCCESS").exists())
    if (sel.contains("gen")) {
      if (!complete(DenseDir)) {
        println(s"[scale] generating $DenseDir")
        ScaleData.generateDense(spark, DenseDir, ref)
      }
      if (!complete(WideDir)) {
        println(s"[scale] generating $WideDir")
        ScaleData.generateWide(spark, WideDir, ref)
      }
    }

    // Representative warmup (same rationale as Bench): the first query
    // in a fresh JVM runs its stages 3-20x slow (interpreter/C1 of the
    // whole SQL runtime), and a cold sweep's first measurement was
    // polluting its own tripwire history (dedup_exact: 1.1 s warm vs
    // 5-6 s as the sweep opener). Exercise scan/split/explode/join/
    // agg/window/sort/noop once, then drop all state.
    try {
      spark.read.parquet(s"$ref/region.parquet").count()
      import org.apache.spark.sql.functions._
      import org.apache.spark.sql.expressions.Window
      val w = spark.range(200000).selectExpr(
        "id % 20011 AS k",
        "concat('tok', id % 31, ' tok', (id + 7) % 31) AS t",
        "CAST(id AS DOUBLE) AS x")
      val e = w.select(col("k"), col("x"),
        explode(array_distinct(split(col("t"), " "))).as("tok"))
      e.join(e.select(col("k"), col("tok"), col("x").as("y")),
          Seq("k", "tok"))
        .groupBy("k")
        .agg(count(lit(1)).as("c"), sum(col("x") * col("y")).as("s"))
        .withColumn("r",
          row_number().over(Window.partitionBy(col("k") % 13)
            .orderBy(col("s").desc)))
        .orderBy("k")
        .write.format("noop").mode("overwrite").save()
      spark.catalog.clearCache()
    } catch { case _: Throwable => }

    // per-(tag, query) medians from prior sweeps (docs/scale_results
    // .jsonl) — the same in-run tripwire Bench carries: a measurement
    // >2.5x its own history re-runs once and ships the min, so one
    // JIT-cold execution can't masquerade as a growth factor (observed:
    // wide txt_containment 26.3 s vs 74.6 s across two sweeps at
    // identical plan counts). A REAL change stays slow on the re-run
    // and still ships loudly via the "rerun" field.
    val history: Map[(String, String), Double] = try {
      val p = java.nio.file.Paths.get("docs/scale_results.jsonl")
      if (!java.nio.file.Files.exists(p)) Map.empty
      else {
        val om = new com.fasterxml.jackson.databind.ObjectMapper()
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.readAllLines(p).asScala
          .filter(_.trim.nonEmpty)
          .flatMap { l =>
            try {
              val n = om.readTree(l)
              if (n.get("ok").asBoolean(false))
                Some((n.get("tag").asText, n.get("query").asText)
                  -> n.get("sec").asDouble)
              else None
            } catch { case _: Throwable => None }
          }
          .groupBy(_._1)
          .map { case (k, vs) =>
            // same aging policy as Bench (last 7 runs): results from
            // old code versions / load bands age out instead of
            // freezing the median forever
            val s = vs.map(_._2).toSeq.takeRight(7).sorted
            k -> s(s.size / 2) }
      }
    } catch { case _: Throwable => Map.empty }

    val jit = java.lang.management.ManagementFactory.getCompilationMXBean
    val jitOk = jit != null && jit.isCompilationTimeMonitoringSupported
    def drainJit(): Unit = if (jitOk) {
      var last = -1L; var spins = 0
      while (jit.getTotalCompilationTime != last && spins < 50) {
        last = jit.getTotalCompilationTime; Thread.sleep(200); spins += 1
      }
    }

    def countOcc(hay: String, needle: String): Int =
      hay.sliding(needle.length).count(_ == needle)

    // locale-independent 2-dp formatting: the f"" interpolator uses the
    // default locale, and a comma-decimal JVM would append invalid JSON
    def d2(x: Double): String = (math.round(x * 100) / 100.0).toString

    // QueryExecutionListener fires on the ASYNC listener bus, so the
    // final plan may not have landed when the action returns — spin
    // (bounded) until a capture TAGGED with this run's sequence number
    // lands and settles. A stale previous-query plan can never be
    // accepted (wrong tag), and a failed query short-circuits to ""
    // rather than spinning the full window over an empty capture.
    def settledPlan(seq: Long, ok: Boolean): String = {
      if (!ok) return ""
      var prev = lastPlan.get()
      var spins = 0
      while (spins < 20 && { Thread.sleep(100); val c = lastPlan.get()
        val changed = c != prev; prev = c; changed || c._1 != seq }) spins += 1
      if (prev._1 == seq) prev._2 else ""
    }

    val out = new StringBuilder
    def runOne(name: String, dir: String): (Double, Boolean, Long) = {
      val fn = extraQueries.getOrElse(name, SparkEntry.queries(name))
      val seq = runSeq.incrementAndGet()
      graft.core.Core.releaseShared()
      spark.catalog.clearCache()
      System.gc()
      drainJit()
      val t0 = System.nanoTime()
      val ok = try {
        fn(spark, dir).write.format("noop").mode("overwrite").save(); true
      } catch { case e: Throwable =>
        System.err.println(s"[scale] $name FAILED: ${e.getMessage}")
        false
      }
      ((System.nanoTime() - t0) / 1e9, ok, seq)
    }
    def sweep(tag: String, dir: String): Unit = queriesFor(tag).foreach {
      name =>
        val (sec0, ok0, seq0) = runOne(name, dir)
        val med = history.getOrElse((tag, name), 0.0)
        val (sec, ok, seq, rerun) =
          if (ok0 && med >= 1.0 && sec0 > 2.5 * med) {
            System.err.println(
              f"[scale] tripwire: $tag/$name ${sec0}%.1fs > 2.5x median ${med}%.1fs, re-running")
            val (sec1, ok1, seq1) = runOne(name, dir)
            if (ok1) (math.min(sec0, sec1), true, seq1,
              s",\"rerun\":[${d2(sec0)},${d2(sec1)}]")
            else (sec0, ok0, seq0, "")
          } else (sec0, ok0, seq0, "")
        val plan = settledPlan(seq, ok)
        val line = s"""{"tag":"$tag","query":"$name","sec":${d2(sec)},""" +
          s""""ok":$ok,"bhj":${countOcc(plan, "BroadcastHashJoin")},""" +
          s""""bex":${countOcc(plan, "BroadcastExchange")}$rerun}"""
        println(s"[scale] $line")
        out.append(line).append('\n')
    }

    if (sel.contains("sf0.1")) sweep("sf0.1", ref)
    if (sel.contains("dense")) sweep("sf1dense", DenseDir)
    if (sel.contains("wide")) sweep("sf1wide", WideDir)

    if (out.nonEmpty)
      java.nio.file.Files.write(
        java.nio.file.Paths.get("docs/scale_results.jsonl"),
        out.toString.getBytes("UTF-8"),
        java.nio.file.StandardOpenOption.CREATE,
        java.nio.file.StandardOpenOption.APPEND)
    spark.stop()
  }
}
