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
}
