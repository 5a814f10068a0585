package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Mergeable cardinality sketches — the 100-TB twin of exact
  * `count(DISTINCT ...)` (q34).
  *
  * Exact distinct counting shuffles every distinct (key, value) pair:
  * Spark plans count(DISTINCT) as a two-round expand+aggregate whose
  * exchange volume is the number of DISTINCT pairs — unbounded in the
  * data. A Datasketches HLL sketch (`hll_sketch_agg`, Spark ≥ 3.5) is a
  * fixed ≤ 2^lgK-register buffer with a partial+final aggregation like
  * any algebraic agg: the exchange carries one ~KB sketch per key per
  * partition, independent of cardinality.
  *
  * The deeper scale property is MERGEABILITY ([[hllMerge]]): sketches
  * built per ingest batch / day / shard union losslessly (same-lgK HLL
  * union is exact over the register state — the union of sketches IS the
  * sketch of the union). A pipeline pre-aggregates one sketch row per
  * (day, key) at ingest, and any later rollup (week, all-time, any key
  * subset) is a cheap union over tiny rows — never a rescan of the raw
  * 100 TB. That replay-free rollup is what exact distinct can never do.
  */
object Sketches {

  /** Approximate distinct count per key group — one partial+final
    * aggregation, bounded state. Standard error ≈ 1.04/√(2^lgK)
    * (~0.8% at the lgK=12 default).
    */
  def hllDistinct(
      df: DataFrame,
      keys: Seq[String],
      valueCol: String,
      lgK: Int = 12): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(
        hll_sketch_estimate(hll_sketch_agg(col(valueCol), lit(lgK)))
          .as("n_distinct_approx"))

  /** One BINARY sketch row per key group — the pre-aggregation shape to
    * persist (e.g. per ingest day). Feed to [[hllMerge]] for rollups.
    */
  def hllSketches(
      df: DataFrame,
      keys: Seq[String],
      valueCol: String,
      lgK: Int = 12): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(hll_sketch_agg(col(valueCol), lit(lgK)).as("hll"))

  /** Roll persisted sketches up to coarser keys (possibly none): union
    * per group, then estimate. Input rows are sketches from
    * [[hllSketches]]; `sketchCol` defaults to its output column.
    */
  def hllMerge(
      sketches: DataFrame,
      keys: Seq[String],
      sketchCol: String = "hll"): DataFrame = {
    val grouped =
      if (keys.isEmpty) sketches.groupBy()
      else sketches.groupBy(keys.map(col): _*)
    grouped.agg(
      hll_sketch_estimate(hll_union_agg(col(sketchCol)))
        .as("n_distinct_approx"))
  }
}
