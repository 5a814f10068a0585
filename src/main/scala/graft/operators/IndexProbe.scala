package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Shared scaffold for the build-once / probe-many index disciplines
  * (scalar-quantized ANN, LSH, IVF, BM25). Every family follows the
  * same shape — read+validate meta, broadcast the query batch, cut
  * candidates per query, restrict the index to the candidate keys,
  * rescore/rank — and the two pieces that drift when hand-rolled per
  * family live here exactly once:
  *
  *  - the KEY RESTRICTION ([[restrictByKeys]] / [[restrictByLocalKeys]]):
  *    below [[LiteralKeyCap]] keys, a collected `IN (…)` literal that
  *    parquet can push (row-group skipping — the small-batch win);
  *    past it, a BROADCAST left-semi join of the key frame (the
  *    `Graph.pprAuto` discipline) — a multi-thousand-literal In-list
  *    bloats analysis/codegen with a plan-sized predicate and parquet
  *    In-pushdown degrades past `inFilterThreshold`, while the
  *    broadcast form's plan size is independent of the key count.
  *    The path choice is made from a STATIC bound known before any
  *    job, so it never costs an extra action.
  *
  *  - the PER-QUERY RANK CUT ([[perQueryTopK]]): row_number over a
  *    query_id-partitioned window + filter, the exact shape Spark's
  *    WindowGroupLimit rewrite pre-prunes map-side (each map task
  *    keeps its local top-k per query BEFORE the exchange — the
  *    difference between shuffling O(parts·k) rows per query and
  *    shuffling the whole scored cross product; PlanSpec pins it).
  */
object IndexProbe {

  /** Switch point between the literal-IN and broadcast-semi-join key
    * restrictions. ~1k keys is where the In-list stops being a win:
    * the predicate no longer fits pushdown thresholds and analysis
    * cost grows linearly with the literal count.
    */
  val LiteralKeyCap = 1000

  /** Restrict `df` to rows whose `keyCol` value appears in `keys` (a
    * one-column frame whose column is named `keyCol`). `staticBound`
    * must upper-bound keys' row count WITHOUT running a job
    * (nQueries·factor·k for ANN candidate cuts, the term-batch size
    * for BM25 — both known from the probe's own arguments).
    *
    * ≤ cap: `keys` collects (bounded by `staticBound`) and rides as a
    * pushed `IN` literal. > cap: no driver round-trip at all — the key
    * frame broadcasts and the restriction is a left-semi hash join
    * (the candidate subplan computes once, on the broadcast side, in
    * the same action as the restricted scan).
    */
  def restrictByKeys(
      df: DataFrame,
      keyCol: String,
      keys: DataFrame,
      staticBound: Long,
      litCap: Int = LiteralKeyCap): DataFrame =
    if (staticBound <= litCap) {
      val vals = keys.collect().map(_.get(0)).distinct
      df.where(col(keyCol).isin(vals.toIndexedSeq: _*))
    } else df.join(broadcast(keys), Seq(keyCol), "left_semi")

  /** [[restrictByKeys]] when the keys already sit on the driver (the
    * BM25 probe's term batch): below the cap the literal IN needs no
    * frame at all; past it `frame` (by-name — only built on this path)
    * broadcasts into the left-semi join.
    */
  def restrictByLocalKeys(
      df: DataFrame,
      keyCol: String,
      vals: Seq[Any],
      frame: => DataFrame,
      litCap: Int = LiteralKeyCap): DataFrame =
    if (vals.size <= litCap) df.where(col(keyCol).isin(vals: _*))
    else df.join(broadcast(frame), Seq(keyCol), "left_semi")

  /** Keep each query's top `k` rows under `order` (which must already
    * be deterministic — the callers' round-before-rank + id-tiebreak
    * contract). The helper owns only the mechanics: a `query_id`-
    * partitioned row_number window and the `<= k` filter, the shape
    * WindowGroupLimit pre-prunes map-side.
    */
  def perQueryTopK(df: DataFrame, k: Int, order: Column*): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(order: _*)
    df.withColumn("__rk", row_number().over(w))
      .where(col("__rk") <= k)
      .drop("__rk")
  }
}
