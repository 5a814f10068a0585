package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
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

  // --------------------------------------------------------------------
  // Count-Min sketch — point-FREQUENCY estimates, completing the sketch
  // family: HLL answers "how many distinct", Misra–Gries answers "which
  // are the heaviest", Count-Min answers "how often does THIS key occur"
  // for any key, with state that never grows with the vocabulary.
  // --------------------------------------------------------------------

  /** Count-Min sketch buffer (Cormode & Muthukrishnan, J.Alg 2005): a
    * depth×width counter matrix, flattened row-major. `n` is the number
    * of inserted (non-null) items — the N in the ε·N error bound.
    *
    * Guarantees with width w, depth d (ε = e/w, δ = e^−d):
    *  - NEVER undercounts: est(x) ≥ true(x) always (each row only adds)
    *  - P[est(x) > true(x) + ε·N] ≤ δ (min over d independent rows)
    *  - merge = elementwise matrix sum, EXACT: the merge of sketches IS
    *    the sketch of the concatenated stream, bit-for-bit — so unlike
    *    MG's lossy table merge, CMS partial aggregation is not just
    *    bound-preserving but batching/partitioning INVARIANT (the spec
    *    asserts identical estimates across partition shapes), and
    *    per-day persisted sketches roll up losslessly.
    *
    * Conservative update (only bump cells that equal the current min)
    * tightens point error but BREAKS the merge-exactness above — partial
    * aggregation needs sum-mergeability, so this is the classic form.
    */
  case class CMSketch(width: Int, depth: Int, n: Long, table: Array[Long])

  /** Row-j cell index of `token`: seeded MurmurHash3 — a pure function
    * shared by insert and estimate, stable across JVMs and runs.
    */
  private[graft] def cmsIdx(token: String, j: Int, width: Int): Int =
    java.lang.Math.floorMod(
      scala.util.hashing.MurmurHash3.stringHash(token, 0x9747b28c + j), width)

  /** One insert — shared by the batch Aggregator's reduce and the
    * streaming per-key state update ([[graft.streaming.StreamCms]]), so
    * the two surfaces cannot drift: identical hash family means the
    * streamed estimates EQUAL the batch estimates on the same rows
    * (CMS inserts are plain additions — commutative, batch-split
    * invariant bit-for-bit). Mutates the caller-owned table.
    */
  private[graft] def cmsInsert(b: CMSketch, token: String): CMSketch =
    if (token == null) b
    else {
      var j = 0
      while (j < b.depth) {
        b.table(j * b.width + cmsIdx(token, j, b.width)) += 1L
        j += 1
      }
      CMSketch(b.width, b.depth, b.n + 1L, b.table)
    }

  final class CountMinAgg(width: Int, depth: Int)
      extends Aggregator[String, CMSketch, CMSketch] {
    require(width > 0 && depth > 0, "width and depth must be positive")

    override def zero: CMSketch =
      CMSketch(width, depth, 0L, new Array[Long](width * depth))

    override def reduce(b: CMSketch, token: String): CMSketch =
      cmsInsert(b, token)

    override def merge(a: CMSketch, b: CMSketch): CMSketch = {
      val t = new Array[Long](width * depth)
      var i = 0
      while (i < t.length) { t(i) = a.table(i) + b.table(i); i += 1 }
      CMSketch(width, depth, a.n + b.n, t)
    }

    override def finish(r: CMSketch): CMSketch = r

    override def bufferEncoder: Encoder[CMSketch] =
      ExpressionEncoder[CMSketch]()
    override def outputEncoder: Encoder[CMSketch] =
      ExpressionEncoder[CMSketch]()
  }

  /** Column aggregate: CMS of a string column. The exchange carries one
    * width·depth·8-byte matrix per partition (80 KB at the 2048×5
    * default) — independent of vocabulary size.
    */
  def cmsSketchAgg(c: Column, width: Int = 2048, depth: Int = 5): Column =
    udaf(new CountMinAgg(width, depth)).apply(c)

  /** Point estimate from a finished sketch: min over rows. Driver-side
    * twin of [[cmsEstimateUdf]] for specs.
    */
  def cmsPointEstimate(s: CMSketch, token: String): Long = {
    var best = Long.MaxValue
    var j = 0
    while (j < s.depth) {
      val c = s.table(j * s.width + cmsIdx(token, j, s.width))
      if (c < best) best = c
      j += 1
    }
    best
  }

  /** In-plan estimate over the FINISHED sketch row (a UDF is fine here:
    * it runs on the probe-sized frame — #probes rows — never the data).
    */
  private def cmsEstimateUdf(width: Int, depth: Int) =
    udf { (table: Seq[Long], token: String) =>
      var best = Long.MaxValue
      var j = 0
      while (j < depth) {
        val c = table(j * width + cmsIdx(token, j, width))
        if (c < best) best = c
        j += 1
      }
      best
    }

  /** Estimated frequencies of `probes` (optionally per key group): ONE
    * partial+final aggregation builds the sketch — the data-sized scan —
    * then the probe list explodes over the k-row sketch frame. Output:
    * keys..., `value`, `est` (≥ true count, ≤ true + e/width·N w.h.p.),
    * `n_total`.
    */
  def cmsFrequencies(
      df: DataFrame,
      valueCol: String,
      probes: Seq[String],
      keys: Seq[String] = Nil,
      width: Int = 2048,
      depth: Int = 5): DataFrame = {
    require(probes.nonEmpty, "need at least one probe key")
    val grouped =
      if (keys.isEmpty) df.groupBy() else df.groupBy(keys.map(col): _*)
    grouped
      .agg(
        cmsSketchAgg(col(valueCol).cast("string"), width, depth).as("cms"),
        count(col(valueCol)).as("n_total"))
      .select(
        (keys.map(col) :+ col("n_total") :+ col("cms.table").as("__t") :+
          explode(array(probes.map(lit): _*)).as("value")): _*)
      .withColumn("est", cmsEstimateUdf(width, depth)(col("__t"), col("value")))
      .drop("__t")
  }
}
