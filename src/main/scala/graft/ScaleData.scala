package graft

import org.apache.spark.sql.{SaveMode, SparkSession}

/** Deterministic sf1-scale testdata generator for the scale-evidence
  * harness ([[Scale]], docs/SCALE.md).
  *
  * `/root/testdata` is read-only and ships nothing above sf0.1, so the
  * 10x datapoint the 100 TB argument needs is generated here, under the
  * repo's own `target/` tree, with the same statistical shape as the
  * driver's sf0.1 tables (measured from the parquet: 31-word vocabulary
  * read from the real corpus, uniform 10..100-token documents,
  * source = doc_id % nSources, 41/14.75x4 language mix, uniform
  * event stream over the same 30 days with constant per-user density,
  * uniform [-0.5, 0.5) 64-dim float embeddings over 10 labels).
  *
  * Two corpus-growth regimes, because they stress DIFFERENT terms of
  * every candidate-join cost model (work per source block is Sum k^2
  * over per-(block, key) chain lengths k):
  *
  *  - DENSE (the driver's own sf0.01 -> sf0.1 pattern): row count x10,
  *    source count unchanged, so every block grows 10x and k-chains
  *    grow 10x => pairwise candidate work must grow ~100x. This regime
  *    PROVES the Sum k^2 bound: observed growth at or under the model's
  *    prediction means no superlinear surprise (a broadcast flip, an
  *    AQE coalesce, a driver-side collect) is hiding in the plan.
  *  - WIDE (how a real corpus grows): row count x10 spread over 10x
  *    more sources, block size constant => per-block work constant,
  *    total work ~10x (linear). This regime proves the engine's scaling
  *    claim where density is constant — the 100 TB deployment shape.
  *
  * Everything is pure-function deterministic per (variant, row id): a
  * re-run bitwise-reproduces both datasets; no timestamps or global RNG.
  */
object ScaleData {

  case class Doc(doc_id: Long, text: String, lang: String, source: String,
      n_chars: Long)
  case class Emb(vec_id: Long, embedding: Array[Float], label: Int)
  case class Ev(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
      event_type: String, value: Double, props: String)

  /** Split-mix style per-row seed: decorrelates consecutive ids without
    * java.util.Random's weak low bits. */
  private def rng(variant: Long, id: Long): scala.util.Random =
    new scala.util.Random((id * 0x9E3779B97F4A7C15L) ^ (variant * 0xBF58476D1CE4E5B9L))

  private val langs = Array("de", "es", "fr", "zh")
  private val eventTypes = Array("click", "error", "purchase", "signup", "view")

  /** The real sf0.1 vocabulary (31 words), so token-df shape — the Sum
    * k^2 driver — matches the corpus every recorded bench number used. */
  private def vocab(s: SparkSession, refDir: String): Array[String] = {
    import org.apache.spark.sql.functions._
    graft.core.Core.table(s, refDir, "documents")
      .select(explode(split(col("text"), " ")).as("tok"))
      .distinct().orderBy("tok")
      .collect().map(_.getString(0))
  }

  /** Output file count: never below 32, whatever the generating
    * session's parallelism. A corpus written as fewer files arrives in
    * fewer scan splits (each small file is one row group, and the
    * open-cost binning keeps one file per split), so a sweep over it
    * UNDER-measures scan parallelism — the round-10 confound where the
    * 8-file sf1 corpora ran first map stages on a quarter of the
    * session's cores while the 100 TB deployment premise is thousands
    * of native splits. */
  def layoutFiles(s: SparkSession): Int =
    math.max(32, graft.operators.SkewJoin.defaultParts(s))

  private def writeDocs(s: SparkSession, outDir: String, refDir: String,
      nDocs: Long, nSources: Int, variant: Long): Unit = {
    import s.implicits._
    val vw = vocab(s, refDir)
    s.range(0, nDocs, 1, layoutFiles(s)).map { id =>
      val r = rng(variant, id)
      val len = 10 + r.nextInt(91)
      val text = Array.fill(len)(vw(r.nextInt(vw.length))).mkString(" ")
      val lang = { val d = r.nextDouble()
        if (d < 0.41) "en" else langs(((d - 0.41) / 0.1475).toInt.min(3)) }
      Doc(id, text, lang, "src" + (id % nSources), text.length.toLong)
    }.write.mode(SaveMode.Overwrite).parquet(s"$outDir/documents.parquet")
  }

  def generate(s: SparkSession, outDir: String, refDir: String,
      nDocs: Long, nSources: Int, nEmb: Long, nEvents: Long,
      nUsers: Int, variant: Long, docsOnly: Boolean = false): Unit = {
    import s.implicits._
    val parts = layoutFiles(s)

    writeDocs(s, outDir, refDir, nDocs, nSources, variant)
    if (docsOnly) return

    s.range(0, nEmb, 1, parts).map { id =>
      val r = rng(variant + 1, id)
      Emb(id, Array.fill(64)(r.nextFloat() - 0.5f), r.nextInt(10))
    }.write.mode(SaveMode.Overwrite).parquet(s"$outDir/embeddings.parquet")

    val t0 = java.time.Instant.parse("2024-01-01T00:00:00Z").toEpochMilli
    val spanMs = 30L * 24 * 3600 * 1000
    s.range(0, nEvents, 1, parts).map { id =>
      val r = rng(variant + 2, id)
      val ts = new java.sql.Timestamp(t0 + (r.nextDouble() * spanMs).toLong)
      Ev(id, ts, r.nextInt(nUsers).toLong, eventTypes(r.nextInt(5)),
        math.round(r.nextDouble() * 60000.0) / 100.0,
        s"""{"k": ${r.nextInt(100)}}""")
    }.write.mode(SaveMode.Overwrite).parquet(s"$outDir/events.parquet")
  }

  /** Row-for-row repack of the driver's read-only ref corpus into the
    * [[layoutFiles]] multi-file layout. The driver writes each sf0.1
    * table as ONE parquet file = ONE row group = ONE scan split, so
    * every sweep baseline ran its first map stages single-task — the
    * measured-and-rejected fan-out experiment's confound (docs/
    * PLANS.md round 10) and an understated base for every growth
    * factor. Repacked, the baseline reads with the same per-core
    * layout as the generated 10x corpora and as the thousands-of-
    * splits 100 TB premise. Values are untouched (round-robin
    * repartition only reorders rows; every contract query ends in a
    * total-order sort); events.ts rides through [[graft.core.Core
    * .table]]'s normalization so the repacked column is the same
    * session-zoned instant the engine computes on either layout. */
  def repackRef(s: SparkSession, outDir: String, refDir: String): Unit = {
    val parts = layoutFiles(s)
    new java.io.File(refDir).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.getName
        .stripSuffix(".parquet")).sorted
      .foreach { t =>
        graft.core.Core.table(s, refDir, t).repartition(parts)
          .write.mode(SaveMode.Overwrite).parquet(s"$outDir/$t.parquet")
      }
  }

  /** One clustered embedding: cluster centers are deterministic
    * uniform [-0.5, 0.5)^64 vectors (their own rng stream, keyed by
    * cluster id), members are center + uniform [-noise, noise]^64
    * jitter. With noise = 0.12 the jitter norm² is ~0.31 against a
    * center norm² of ~5.33, so member-to-center cosine lands ≈ 0.97
    * and PAIRWISE same-cluster cosine ≈ 0.94 — the planted-neighbor
    * regime (cos ≥ 0.8, round-8 verdict ask #1) where hyperplane LSH's
    * collision probability p = 1 − θ/π ≈ 0.89 per plane actually
    * bites, unlike the shipped corpus's near-orthogonal cos ≈ 0.3
    * neighbors. label = cluster % 10 keeps the embeddings-table shape. */
  def clusteredEmb(variant: Long, id: Long, nClusters: Int): Emb = {
    val k = (id % nClusters).toInt
    val rc = rng(variant + 3, 1000000L + k)
    val r = rng(variant + 4, id)
    val noise = 0.12f
    Emb(id, Array.fill(64)(
      (rc.nextFloat() - 0.5f) + (r.nextFloat() - 0.5f) * 2f * noise),
      k % 10)
  }

  /** Clustered embeddings relation (no files — the recall harness and
    * spec consume it directly): nVec vectors over nClusters planted
    * clusters, cluster membership id % nClusters so any vec_id prefix
    * (the bounded probe convention) spans many clusters. */
  def clusteredDf(s: SparkSession, nVec: Long, nClusters: Int)
      : org.apache.spark.sql.DataFrame = {
    import s.implicits._
    s.range(0, nVec, 1, graft.operators.SkewJoin.defaultParts(s))
      .map(id => clusteredEmb(variant = 9, id, nClusters)).toDF()
  }

  /** sf0.1 shape x10 rows, sources UNCHANGED: blocks grow 10x. */
  def generateDense(s: SparkSession, outDir: String, refDir: String): Unit =
    generate(s, outDir, refDir, nDocs = 50000, nSources = 20,
      nEmb = 8000, nEvents = 1000000, nUsers = 15000, variant = 1)

  /** sf0.1 shape x10 rows over 10x sources: blocks stay sf0.1-sized. */
  def generateWide(s: SparkSession, outDir: String, refDir: String): Unit =
    generate(s, outDir, refDir, nDocs = 50000, nSources = 200,
      nEmb = 8000, nEvents = 1000000, nUsers = 15000, variant = 2)

  /** The SECOND scale decade: sf0.1 shape x100 rows over 100x sources —
    * the WIDE (constant-block-density) regime at ≈100x the contract
    * scale, documents only (the flagship compositions and the global
    * SimHash dedup read nothing else). One decade past [[generateWide]],
    * this is the datapoint that converts "linear at 10x" into a
    * measured two-decade line for the 100x claim. */
  def generateWide100(s: SparkSession, outDir: String, refDir: String): Unit =
    generate(s, outDir, refDir, nDocs = 500000, nSources = 2000,
      nEmb = 8000, nEvents = 1000000, nUsers = 15000, variant = 3,
      docsOnly = true)

  /** EMBEDDING scale decades (round-11 verdict #3): the contract
    * corpus ships 2,000 uniform vectors at sf0.1 — every ANN scale
    * claim before round 12 was plan prose. These corpora grow the
    * `embeddings` table 10x / 100x in the CLUSTERED regime (the
    * locality-bearing one — planted same-cluster cosine ≈ 0.94, see
    * [[clusteredEmb]]), with planted-cluster count ∝ √n so
    * neighborhood size grows with the corpus the way a real embedded
    * crawl's does (more docs per topic AND more topics). `documents`
    * is generated id-aligned at the same row count because
    * `multimodal_align_filter` joins doc metadata onto the vectors. */
  /** Planted geometry per emb corpus tag: (nVec, nClusters). Cluster
    * count grows ∝ √n, so NEIGHBORHOOD SIZE (n/nClusters) also grows
    * ∝ √n — deliberately harsher than constant-density growth: more
    * docs per topic AND more topics. The price is analytic: planted
    * same-cluster pair mass n·(n/k − 1)/2 grows ~10^1.5 ≈ 31.6× per
    * decade, and the emb-decade gates normalize the candidate-bound
    * members' bands by exactly that measured-geometry ratio (the
    * outAdj/edgeAdj pattern — the engine is gated linear PER PLANTED
    * NEAR PAIR, never sublinear in the similarity mass the corpus
    * actually carries). The generators read THIS map so the gate's
    * normalization can never drift from the data. */
  val embGeometry: Map[String, (Long, Int)] = Map(
    "emb1x" -> ((2000L, 45)),
    "emb10x" -> ((20000L, 141)),
    "emb100x" -> ((200000L, 447)),
    // the FOURTH decade (round 14, r13 verdict #2): 2M vectors — the
    // exact point the pre-r14 routing menu saturated (320²·20 =
    // 2.048M); measuring it makes k = 320 a certified decade and
    // leaves the extended menu {1000, 3200} two decades of headroom
    "emb1000x" -> ((2000000L, 1414)),
    // the FIFTH decade (round 16, r15 verdict #3): 20M vectors at the
    // continuous √n cluster geometry — generated ONLY for the one
    // affordable row of the 5th-decade projection (sim_pq_topk's
    // era-pv, ~280 s projected); the full ANN-family sweep at this
    // scale is the ≥ 12 h item docs/SCALE.md round 15 prices out
    "emb10000x" -> ((20000000L, 4472)))

  /** The clustered-regime BASE (contract-scale 2,000 vectors): the
    * emb decades' growth factors compare clustered-vs-clustered, not
    * the contract's uniform corpus vs a clustered one (regime change
    * would confound the growth model — pair-pass density differs). */
  def generateEmb1(s: SparkSession, outDir: String, refDir: String): Unit =
    generateEmbScale(s, outDir, refDir, nVec = embGeometry("emb1x")._1,
      nClusters = embGeometry("emb1x")._2, variant = 7)

  def generateEmb10(s: SparkSession, outDir: String, refDir: String): Unit =
    generateEmbScale(s, outDir, refDir, nVec = embGeometry("emb10x")._1,
      nClusters = embGeometry("emb10x")._2, variant = 5)

  def generateEmb100(s: SparkSession, outDir: String, refDir: String): Unit =
    generateEmbScale(s, outDir, refDir, nVec = embGeometry("emb100x")._1,
      nClusters = embGeometry("emb100x")._2, variant = 6)

  def generateEmb1000(s: SparkSession, outDir: String, refDir: String): Unit =
    generateEmbScale(s, outDir, refDir, nVec = embGeometry("emb1000x")._1,
      nClusters = embGeometry("emb1000x")._2, variant = 8)

  /** The FIFTH embedding decade, EMBEDDINGS ONLY: `sim_pq_topk` (the
    * one query measured at this scale) reads nothing else, and the
    * 20M-row documents table would roughly triple the corpus bytes
    * for an unread input. ~5 GB parquet at 20M × 64-float vectors. */
  def generateEmb10000(s: SparkSession, outDir: String,
      refDir: String): Unit = {
    import s.implicits._
    s.range(0, embGeometry("emb10000x")._1, 1, layoutFiles(s))
      .map(id => clusteredEmb(109, id, embGeometry("emb10000x")._2))
      .write.mode(SaveMode.Overwrite).parquet(s"$outDir/embeddings.parquet")
  }

  def generateEmbScale(s: SparkSession, outDir: String, refDir: String,
      nVec: Long, nClusters: Int, variant: Long): Unit = {
    import s.implicits._
    s.range(0, nVec, 1, layoutFiles(s))
      .map(id => clusteredEmb(variant + 100, id, nClusters))
      .write.mode(SaveMode.Overwrite).parquet(s"$outDir/embeddings.parquet")
    writeDocs(s, outDir, refDir, nDocs = nVec,
      nSources = math.max(20, (nVec / 250).toInt), variant = variant + 101)
  }

  /** The THIRD scale decade: ≈1000x contract scale in the WIDE regime,
    * documents only — the corpus behind the sf100wide census + sweep
    * of the global dedup family (the queries whose viability at
    * 100 TB rests on combo-key occupancy staying flat and the CC
    * pair bound holding another decade). */
  def generateWide1000(s: SparkSession, outDir: String, refDir: String): Unit =
    generate(s, outDir, refDir, nDocs = 5000000, nSources = 20000,
      nEmb = 8000, nEvents = 1000000, nUsers = 15000, variant = 4,
      docsOnly = true)

  /** HUB-degree document set (round-12 verdict #5): the sweep corpora's
    * sketch graphs are benign — degree bounded by the 31-word banded
    * vocabulary's collision structure — and `dedup_simhash_topk`'s K+1
    * pool-cut exactness argument has only been exercised there. This
    * relation plants a heavy-tailed sketch-DEGREE geometry: one
    * template document plus `nVariants` one/two-token-edit variants (a
    * near-dup's SimHash moves only the bits whose vote margin the edit
    * can cross, so the variants land in a dense Hamming cloud around
    * the template's sketch — the "hub sketch with thousands of near
    * sketch values" input that stresses the (1 + degree)·(K+1) pool
    * window and the nearTop map-side cut), over a background of
    * sf-shaped docs. The realized degree is MEASURED, not prescribed —
    * the topkhub census records the sketch-degree distribution next to
    * the timing, and the gate requires the hub to have actually
    * materialized (max degree ≥ its floor) before the timing row
    * counts as adversarial evidence. Exposed as a relation (no files)
    * for the spec; [[generateHub]] writes the parquet corpus for the
    * Scale mode. */
  def hubDocsDf(s: SparkSession, refDir: String, nDocs: Long,
      nVariants: Long, nSources: Int, variant: Long)
      : org.apache.spark.sql.DataFrame = {
    import s.implicits._
    val vw = vocab(s, refDir)
    // Template length MEASURED at 21/31/101 tokens: realized max
    // sketch-VALUE degree is ~520 at every setting — the cap is the
    // background corpus's own sketch density, not the hub, because
    // near-dup text COLLAPSES to equal/near sketch values (the
    // sketch's purpose) and only the template's low-margin bits are
    // reachable by token edits. What the text-level hub DOES plant is
    // the giant same-sketch group (82k members at len 101; 27k at 31)
    // plus a dense ~520-degree neighborhood — the realizable-by-
    // documents adversarial shape. The PRESCRIBED-degree geometry
    // (10k+ near values) cannot arise from text and is censused at
    // the sketch level instead: [[hubSketchesDf]] + the operator core
    // `DedupOps.simhashTopKGlobalOf`.
    val baseLen = 31
    val rb = rng(variant, -1L)
    val base = Array.fill(baseLen)(vw(rb.nextInt(vw.length)))
    s.range(0, nDocs, 1, layoutFiles(s)).map { id =>
      val r = rng(variant, id)
      val text =
        if (id < nVariants) {
          val t = base.clone()
          t(r.nextInt(baseLen)) = vw(r.nextInt(vw.length))
          // two-edit variants widen the cloud (more DISTINCT sketch
          // values at small Hamming) — the degree driver
          if (id % 3 != 0) t(r.nextInt(baseLen)) = vw(r.nextInt(vw.length))
          t.mkString(" ")
        } else {
          val len = 10 + r.nextInt(91)
          Array.fill(len)(vw(r.nextInt(vw.length))).mkString(" ")
        }
      val lang = { val d = r.nextDouble()
        if (d < 0.41) "en" else langs(((d - 0.41) / 0.1475).toInt.min(3)) }
      Doc(id, text, lang, "src" + (id % nSources), text.length.toLong)
    }.toDF()
  }

  /** [[hubDocsDf]] written as a documents-only corpus dir for the
    * `topkhub` Scale mode. */
  def generateHub(s: SparkSession, outDir: String, refDir: String): Unit =
    hubDocsDf(s, refDir, nDocs = 200000, nVariants = 100000,
      nSources = 800, variant = 11)
      .write.mode(SaveMode.Overwrite).parquet(s"$outDir/documents.parquet")

  /** PRESCRIBED-degree synthetic sketch relation (doc_id, simhash) for
    * the sketch-level hub census: a template 62-bit value T, exactly
    * `hubDegree` DISTINCT values within Hamming ≤ 3 of T (all 62
    * 1-flips, all 1,891 2-flips, then deterministic 3-flips until the
    * degree is met — every one is near T by construction, so T's
    * sketch-VALUE degree IS hubDegree), `membersPerValue` member docs
    * per near value, a `hubMembers`-doc same-sketch group AT T, and a
    * far background of uniform sketches (Hamming ≫ 3 from T with
    * overwhelming probability). This is the (1 + degree)·(K+1)
    * pool-window input at a degree document text cannot realize. */
  def hubSketchesDf(s: SparkSession, hubDegree: Int, membersPerValue: Int,
      hubMembers: Int, nBackground: Long)
      : org.apache.spark.sql.DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.functions.{col, expr, lit}
    require(hubDegree <= 62 + 1891 + 37820, "degree exceeds the <=3 ball")
    val t = 0x2AAAAAAAAAAAAAAAL & ((1L << 62) - 1) // alternating-bit template
    // deterministic enumeration of distinct flip masks in (1,2,3)-bit
    // order — Hamming from T equals the popcount of the mask
    val flips = new scala.collection.mutable.ArrayBuffer[Long](hubDegree)
    var done = false
    for (i <- 0 until 62 if !done) {
      flips += (1L << i); done = flips.size >= hubDegree
    }
    for (i <- 0 until 62 if !done; j <- (i + 1) until 62 if !done) {
      flips += (1L << i) | (1L << j); done = flips.size >= hubDegree
    }
    for (i <- 0 until 62 if !done; j <- (i + 1) until 62 if !done;
        l <- (j + 1) until 62 if !done) {
      flips += (1L << i) | (1L << j) | (1L << l)
      done = flips.size >= hubDegree
    }
    val nearValues = flips.take(hubDegree).map(t ^ _).toSeq
    val near = s.createDataset(nearValues.zipWithIndex.flatMap {
      case (sh, vi) => (0 until membersPerValue).map(m =>
        (1000000L + vi.toLong * membersPerValue + m, sh))
    })(org.apache.spark.sql.Encoders.product[(Long, Long)])
      .toDF("doc_id", "simhash")
    val hub = s.range(0, hubMembers, 1, layoutFiles(s))
      .select(col("id").as("doc_id"), lit(t).as("simhash"))
    val bg = s.range(0, nBackground, 1, layoutFiles(s))
      .select((col("id") + 100000000L).as("doc_id"),
        expr(s"abs(xxhash64(id)) % ${1L << 62}").as("simhash"))
    hub.unionByName(near).unionByName(bg)
  }
}
