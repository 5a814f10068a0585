package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.NumericType

/** O1 axis=0 and O2 — column-wise apply and element-wise applymap.
  * Reference: data_types/dataframe.py:13-22 (column chunking),
  * :50-51 (result-shape sniffing), :53-75 (applymap);
  * patched at core.py:523-530.
  *
  * pandas `df.apply(func, axis=0)` hands each *column* to the function;
  * the result is either a reduced scalar per column (shape sniff →
  * one-row frame) or a transformed column (same-length frame). We make
  * the two shapes explicit:
  *  - [[reduce]]   — per-column aggregate (e.g. `max(x)-min(x)`): a single
  *    `select` of aggregate expressions = one partial+final aggregation
  *    pass, all columns in parallel (Catalyst evaluates them in one scan,
  *    map-side partials, no row shuffle — only the O(#cols) partial rows).
  *  - [[transform]] — per-column same-length transform: one `select`,
  *    whole-stage codegen, zero shuffle.
  *  - [[applymap]]  — O2: the same cell function applied to every column.
  *
  * The reference parallelizes axis=0 by slicing columns across workers;
  * Catalyst does strictly better: one data pass evaluates all column
  * expressions simultaneously (row-parallel over partitions), instead of
  * #cols independent passes.
  */
object ColApply {

  /** Per-column aggregate — result is one row, one value per column. */
  def reduce(df: DataFrame, cols: Seq[String])(
      f: Column => Column,
      outName: String => String = identity): DataFrame =
    df.select(cols.map(c => f(col(c)).as(outName(c))): _*)

  /** Per-column transform — result has the input's row count. */
  def transform(df: DataFrame, cols: Seq[String])(
      f: Column => Column,
      outName: String => String = identity): DataFrame =
    df.select(cols.map(c => f(col(c)).as(outName(c))): _*)

  /** pandas `gb[col].describe()` — the eight summary stats per group in
    * ONE aggregation pass (count/mean/std/min/p25/p50/p75/max). std is
    * the sample std (pandas ddof=1). The three exact interpolated
    * percentiles share q27's SCALE BOUND (per-group value multiset in
    * the agg buffer) — at 100 TB swap them for `approx_percentile`
    * (q43's twin rationale); count/mean/std/min/max are plain
    * partial+final aggregates at any scale.
    */
  def describeBy(
      df: DataFrame,
      valueCol: String,
      keys: Seq[String]): DataFrame = {
    import org.apache.spark.sql.functions._
    df.groupBy(keys.map(col): _*)
      .agg(
        count(col(valueCol)).as("n"),
        avg(col(valueCol)).as("mean"),
        stddev_samp(col(valueCol)).as("std"),
        min(col(valueCol)).as("min"),
        expr(s"percentile($valueCol, 0.25)").as("p25"),
        expr(s"percentile($valueCol, 0.5)").as("p50"),
        expr(s"percentile($valueCol, 0.75)").as("p75"),
        max(col(valueCol)).as("max"))
  }

  /** pandas `gb[col].mode()` (first mode) — most frequent value per
    * group with an explicit deterministic tiebreak (highest count, then
    * LOWEST value — pandas mode() returns values sorted ascending, so
    * its first element matches). Two partial+final aggregations: count
    * per (key, value), then max_by on the (count, −value) order — no
    * window, no per-group buffering. Returns (keys..., mode, n_mode).
    */
  def modeBy(
      df: DataFrame,
      valueCol: String,
      keys: Seq[String]): DataFrame = {
    import org.apache.spark.sql.functions._
    df.groupBy((keys :+ valueCol).map(col): _*)
      .agg(count(lit(1)).as("__c"))
      .groupBy(keys.map(col): _*)
      .agg(
        max_by(
          col(valueCol),
          struct(col("__c"), negate(col(valueCol)))).as("mode"),
        max(col("__c")).as("n_mode"))
  }

  /** O2 applymap: apply the cell function to every column of `cols`
    * (default: all numeric columns), carrying `keep` columns through
    * unchanged (pandas applymap transforms all cells; we keep key columns
    * addressable so results stay joinable/sortable).
    */
  def applymap(
      df: DataFrame,
      f: Column => Column,
      cols: Seq[String] = Nil,
      keep: Seq[String] = Nil,
      outName: String => String = identity,
      counter: Option[graft.progress.Progress.RowCounter] = None): DataFrame = {
    val target =
      if (cols.nonEmpty) cols
      else
        df.schema.fields
          .filter(_.dataType.isInstanceOf[NumericType])
          .map(_.name)
          .toSeq
    val kept = keep.map(col)
    val mapped = target.map(c => f(col(c)).as(outName(c)))
    val out = df.select(kept ++ mapped: _*)
    // applymap accounting = rows × cols (reference core.py:228-235):
    // the tap ticks #target units per row after the codegen'd select
    counter match {
      case None    => out
      case Some(c) => graft.progress.Progress.ticked(out, c, target.size.toLong)
    }
  }
}
