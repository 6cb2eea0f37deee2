package graft

import org.apache.spark.sql.functions._

/** Sketch-collision census for the GLOBAL SimHash family — the
  * diagnostic main behind docs/SCALE.md's round-11 section. For each
  * corpus dir it prints: docs vs DISTINCT sketches, same-sketch pair
  * mass Σ C(k,2) and the max identical-sketch group, 16-bit band
  * bucket occupancy over distinct sketches (the round-10 global
  * banding — the quantity that saturates at 2^16 and went quadratic
  * at sf10wide), the Manku 6-block combination-key candidate mass and
  * max bucket (the m6 replacement), and the true Hamming<=3 edge
  * count among distinct sketches. These numbers are what separated
  * "the engine is superlinear" (a plan flaw) from "the LISTING's own
  * output is Σk²" (an output bound) and sized the star reduction. */
object Diag {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (dir <- args) {
      val sk = operators.DedupOps.simhash64Sketches(spark, dir)
        .select("doc_id", "simhash").cache()
      val n = sk.count()
      val groups = sk.groupBy("simhash").agg(count(lit(1)).as("k")).cache()
      val d = groups.count()
      // k·(k-1) is even: halve AFTER the long-typed sum, with a SHIFT —
      // Column `/` is true division (DoubleType), which would silently
      // lose integer precision past 2^53 both inside the aggregation
      // and on the summed total (the regime this census exists to
      // size; same rule as DedupOps.globalPairCount)
      val stats = groups.agg(
        shiftright(sum(col("k") * (col("k") - 1)), 1)
          .as("samesketch_pairs"),
        max("k").as("max_group"),
        sum(when(col("k") > 1, 1).otherwise(0)).as("groups_gt1")).head()
      // band occupancy over DISTINCT sketches (4 x 16-bit bands)
      val nBands = 4; val width = 16; val mask = (1L << width) - 1
      val bandStructs = array((0 until nBands).map { j =>
        struct(lit(j).as("band"),
          shiftright(col("simhash"), j * width).bitwiseAND(lit(mask))
            .as("bbits")) }: _*)
      val bands = groups.select(explode(bandStructs).as("bs"))
        .groupBy("bs.band", "bs.bbits").agg(count(lit(1)).as("occ"))
      val bstats = bands.agg(
        shiftright(sum(col("occ") * (col("occ") - 1)), 1)
          .as("distinct_band_pairs"),
        max("occ").as("max_bucket")).head()
      println(s"[diag] dir=$dir docs=$n distinct_sketches=$d " +
        s"samesketch_pairs=${stats.get(0)} max_group=${stats.get(1)} " +
        s"groups_gt1=${stats.get(2)} " +
        s"distinct_band_candidates=${bstats.get(0)} " +
        s"max_band_bucket=${bstats.get(1)}")
      // Manku-style combination keying: 6 blocks over 62 bits
      // (11,11,10,10,10,10); any ham<=3 pair agrees exactly on >=3
      // blocks => collides on >=1 of the C(6,3)=20 3-block keys.
      val blockWidths = Seq(11, 11, 10, 10, 10, 10)
      val blockOffsets = blockWidths.scanLeft(0)(_ + _).init
      def blockBits(j: Int) =
        shiftright(col("simhash"), blockOffsets(j))
          .bitwiseAND(lit((1L << blockWidths(j)) - 1))
      val combos = (0 until 6).combinations(3).toSeq
      val comboStructs = array(combos.zipWithIndex.map { case (c, i) =>
        // pack the 3 selected blocks' bits into one long key
        val key = c.foldLeft(lit(0L)) { (acc, j) =>
          shiftleft(acc, blockWidths(j)) + blockBits(j) }
        struct(lit(i).as("combo"), key.as("kbits")) }: _*)
      val cb = groups.select(explode(comboStructs).as("cs"))
        .groupBy("cs.combo", "cs.kbits").agg(count(lit(1)).as("occ"))
      val cstats = cb.agg(
        shiftright(sum(col("occ") * (col("occ") - 1)), 1)
          .as("combo_candidates"),
        max("occ").as("max_combo_bucket")).head()
      println(s"[diag] dir=$dir combo_candidates=${cstats.get(0)} " +
        s"max_combo_bucket=${cstats.get(1)}")
      // true ham<=3 edges among DISTINCT sketches, via the combo join
      // with first-agreeing-combo dedup (each true pair counted once)
      val g = groups.select(col("simhash"))
      val rows = g.select(col("simhash"), explode(comboStructs).as("cs"))
        .select(col("simhash"), col("cs.combo").as("combo"),
          col("cs.kbits").as("kbits"))
      def bb(c: org.apache.spark.sql.Column, j: Int) =
        shiftright(c, blockOffsets(j))
          .bitwiseAND(lit((1L << blockWidths(j)) - 1))
      val a2 = rows.select(col("combo"), col("kbits"),
        col("simhash").as("a_sh"))
      val b2 = rows.select(col("combo"), col("kbits"),
        col("simhash").as("b_sh"))
      val earlier = combos.zipWithIndex.map { case (c, i) =>
        (col("combo") > i) && c.map(j => bb(col("a_sh"), j) === bb(col("b_sh"), j))
          .reduce(_ && _)
      }.foldLeft(lit(false))(_ || _)
      val trueEdges = a2.join(b2, Seq("combo", "kbits"))
        .filter(col("a_sh") < col("b_sh"))
        .filter(bit_count(col("a_sh").bitwiseXOR(col("b_sh"))) <= 3)
        .filter(!earlier)
        .count()
      println(s"[diag] dir=$dir true_cross_sketch_edges=$trueEdges")
      sk.unpersist(); groups.unpersist()
    }
    spark.stop()
  }
}
