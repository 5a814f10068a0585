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
    val l = left.withColumn("__salt", pmod(hash(saltSource), lit(salts)))
    val r = right.withColumn(
      "__salt",
      explode(array((0 until salts).map(lit): _*)))
    l.join(r, Seq(key, "__salt"), joinType).drop("__salt")
  }
}
