package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Manual skew mitigation for hot join keys: salt the skewed (large)
  * side into `salt` sub-keys and replicate the build (small) side once
  * per sub-key, so one hot key's rows spread over `salt` reducers
  * instead of one straggler.
  *
  * AQE's skew-join split (on by default) handles sort-merge skew at
  * runtime; this utility is for the cases AQE can't re-plan — e.g. a
  * skewed shuffle feeding an aggregation, or deliberate pre-salting of
  * a known-pathological key — and documents the technique the engine
  * would deploy on 100 TB inputs. The join result is provably identical
  * to the unsalted equi-join (asserted in SkewJoinSpec).
  */
object SkewJoin {

  /** Equi-join `big ⋈ small` on big(bigKey) == small(smallKey), with the
    * big side salted into `salt` sub-partitions. `small` rows replicate
    * `salt` times (keep it the dimension side).
    *
    * Only join types whose output rows are driven by the (unsalted) big
    * side are allowed: inner, left/left_outer, left_semi, left_anti.
    * A right/full outer join would emit each unmatched small-side row
    * once PER SALT REPLICA, diverging from the unsalted join. */
  def saltedEquiJoin(big: DataFrame, small: DataFrame, bigKey: String,
      smallKey: String, salt: Int, joinType: String = "inner"): DataFrame = {
    require(salt > 0, "salt must be positive")
    // Spark's JoinType aliases (JoinType.apply strips underscores, NOT
    // spaces — mirror it exactly so everything this guard accepts the
    // join itself accepts): inner, left/left_outer, left_semi/semi,
    // left_anti/anti are all big-side-driven.
    require(
      Set("inner", "left", "leftouter", "leftsemi", "semi", "leftanti",
        "anti").contains(
        joinType.toLowerCase.replaceAll("_", "")),
      s"saltedEquiJoin does not preserve $joinType semantics: unmatched " +
        "small-side rows would be duplicated once per salt replica")
    // distribution-only randomness: any stable per-row value works;
    // the salt never affects which rows match, only where they land.
    val saltedBig = big.withColumn("__salt",
      pmod(hash(monotonically_increasing_id()), lit(salt)))
    val replicatedSmall = small.withColumn("__salt",
      explode(array((0 until salt).map(lit): _*)))
    saltedBig
      .join(replicatedSmall,
        saltedBig(bigKey) === replicatedSmall(smallKey)
          && saltedBig("__salt") === replicatedSmall("__salt"),
        joinType)
      .drop("__salt")
  }

  /** Salted, explicitly-partitioned inner equi-join for corpus-scaled
    * CANDIDATE joins over low-distinct keys — the shape every
    * set-similarity / LSH-bucket / inverted-list join in this engine
    * has: both sides grow with the corpus, but the join key is
    * vocabulary- or bucket-bounded (tokens, shingles, band bits,
    * centroid ids), so each key carries a duplicate chain of k rows and
    * the join emits Σk² candidate rows.
    *
    * Two failure modes of leaving such a join to the planner, both
    * measured (docs/BENCH_NOTES.md round 3/4):
    *  1. stats-driven BROADCAST degenerates into single-threaded
    *     duplicate-chain probes (and is a driver OOM at scale);
    *  2. a bare `hint("shuffle_hash")` pins the strategy but not the
    *     LAYOUT: the shuffle carries few distinct keys and little data,
    *     so AQE's partition coalescing legally merges the post-shuffle
    *     partitions (input-byte-sized, blind to the Σk² probe-output
    *     blowup) and the probe stage serializes onto a handful of
    *     tasks — the round-3 453 s driver bench.
    *
    * The fix is structural, not a hint: spread each key's chain over
    * `salt` sub-keys (left rows get a deterministic per-row salt, right
    * rows replicate once per salt value), and shuffle both sides with
    * an EXPLICIT partition count on (keys ++ salt). `repartition(n, …)`
    * is a user-specified exchange that AQE never coalesces, the salted
    * key space is `salt`× finer than the vocabulary, and the join
    * reuses the exchanges directly (same keys, same count on both
    * sides), so probe work lands balanced on exactly `parts` tasks on
    * every run — plan shape no longer depends on cache state, stats, or
    * load. Output equals the plain inner equi-join on `keys`: each left
    * row carries ONE salt value and meets each matching right row in
    * exactly one replica.
    *
    * Cost: the right side shuffles `salt`× replicated — price it like a
    * skew-join replication factor (salt ≈ 8 spreads a hot chain 8× for
    * 8× one side's shuffle volume; the probe output, which dominates
    * these joins, is unchanged). Keep the smaller relation right.
    */
  /** The session's configured shuffle parallelism — the explicit
    * partition count for exchanges whose layout must not depend on
    * runtime stats. */
  def defaultParts(s: org.apache.spark.sql.SparkSession): Int =
    s.conf.get("spark.sql.shuffle.partitions").toInt

  def saltedCandidateJoin(left: DataFrame, right: DataFrame,
      keys: Seq[String], leftSaltBy: Column, salt: Int = 8,
      parts: Int = 0): DataFrame = {
    require(salt > 0, "salt must be positive")
    val n = if (parts > 0) parts else defaultParts(left.sparkSession)
    val shuffleKeys = keys.map(col) :+ col("__salt")
    val l = left
      .withColumn("__salt", pmod(hash(leftSaltBy), lit(salt)))
      .repartition(n, shuffleKeys: _*)
    val r = right
      .withColumn("__salt", explode(array((0 until salt).map(lit): _*)))
      .repartition(n, shuffleKeys: _*)
    // the hint forbids a stats/AQE broadcast flip; with both sides
    // pre-partitioned on the join keys the SHJ adds no further exchange
    l.hint("shuffle_hash").join(r, keys :+ "__salt").drop("__salt")
  }
}
