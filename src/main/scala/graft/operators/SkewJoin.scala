package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys.
  *
  * A hash join puts every row of one key in one task; a hot key (one
  * customer with 10^9 events) serializes the join. Salting splits each
  * hot key into `salts` sub-keys: the big side gets a deterministic salt
  * from a secondary column hash, the small-but-matching side is
  * replicated once per salt. The shuffle then spreads a hot key over
  * `salts` tasks at the cost of replicating the right side `salts`x —
  * the right trade when left >> right per key.
  *
  * AQE's skew-join handling covers sort-merge joins it can split;
  * salting remains the tool when the skew sits under an aggregation or
  * an operator AQE cannot split (e.g. flatMapGroups pipelines,
  * SURVEY §7.4).
  *
  * Deterministic: the salt is `pmod(hash(saltSource), salts)` — results
  * are reproducible and partitioning-independent.
  */
object SkewJoin {

  def salted(
      left: DataFrame,
      right: DataFrame,
      key: String,
      saltSource: Column,
      salts: Int,
      joinType: String = "inner"): DataFrame = {
    require(salts > 0, s"salts must be > 0, got $salts") // 0 → empty join
    // the RIGHT side is replicated per salt, so join types that emit
    // unmatched right rows would emit each one `salts` times — refuse
    // rather than silently duplicate
    val rightPreserving = Set("right", "rightouter", "right_outer",
      "full", "outer", "fullouter", "full_outer")
    require(
      !rightPreserving(joinType.toLowerCase.replace(" ", "")),
      s"salted join cannot do '$joinType': the replicated right side " +
        "would emit every unmatched right row once per salt — salt the " +
        "other side, or use a non-right-preserving join type")
    val l = left.withColumn("__salt", pmod(hash(saltSource), lit(salts)))
    val r = right.withColumn(
      "__salt",
      explode(array((0 until salts).map(lit): _*)))
    l.join(r, Seq(key, "__salt"), joinType).drop("__salt")
  }
}
