package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.{Window, WindowSpec}
import org.apache.spark.sql.functions._

/** O6 / O7 / O8 — rolling and expanding window apply.
  * Reference: pandarallel/core.py:538-556, data_types/series_rolling.py,
  * rolling_groupby.py, expanding_groupby.py.
  *
  * The reference ships `window` extra rows per chunk and trims the
  * warm-up region after computing (series_rolling.py:16,47) — a manual
  * overlap protocol. Spark's `WindowExec` makes that protocol obsolete:
  * after one range/hash exchange, frame boundaries are handled inside the
  * operator (SURVEY §4.2). We therefore declare frames:
  *
  *  - rolling(w):   `rowsBetween(-(w-1), 0)`
  *  - expanding():  `rowsBetween(unboundedPreceding, 0)`
  *  - min_periods:  `when(count(col) over frame >= minPeriods, expr)`
  *    — reproduces pandas' NaN warm-up (first minPeriods-1 outputs null,
  *    tests/test_pandarallel.py:263-269).
  *
  * Scale posture: the *grouped* variants (O7/O8 — partitionBy(groupKeys))
  * scale horizontally: one hash exchange, then each group's window is
  * evaluated locally. The *ungrouped* Series variant (O6) implies a total
  * order, which Spark plans as a single-partition window — correct but a
  * scale bottleneck, exactly like pandas' single global sequence. For
  * 100 TB, express sequence locality with a partition key (as O7 does) or
  * with [[rollingAgg]] over a bucketed time key.
  *
  * Arbitrary (non-algebraic) window UDFs: [[rollingCollect]] materializes
  * the frame as an array (`collect_list` is size-bounded by the window
  * width w, so memory is O(w) per row) and applies a Scala UDF — the
  * general escape hatch mirroring the reference's black-box
  * `rolling.apply(func)`. Prefer algebraic rewrite whenever the function
  * is recognizable (SURVEY §7.4): for expanding windows especially,
  * collect-based frames are O(n) per row and an algebraic `sum/avg/...`
  * over the frame is the only shape that survives scale.
  */
object Windows {

  def rollingFrame(
      orderBy: Seq[Column],
      partitionBy: Seq[Column],
      window: Int): WindowSpec = {
    val base =
      if (partitionBy.isEmpty) Window.orderBy(orderBy: _*)
      else Window.partitionBy(partitionBy: _*).orderBy(orderBy: _*)
    base.rowsBetween(-(window - 1), 0)
  }

  def expandingFrame(
      orderBy: Seq[Column],
      partitionBy: Seq[Column]): WindowSpec = {
    val base =
      if (partitionBy.isEmpty) Window.orderBy(orderBy: _*)
      else Window.partitionBy(partitionBy: _*).orderBy(orderBy: _*)
    base.rowsBetween(Window.unboundedPreceding, Window.currentRow)
  }

  /** pandas min_periods guard: null until the frame holds >= minPeriods
    * non-null values.
    */
  def withMinPeriods(
      value: Column,
      countedCol: Column,
      frame: WindowSpec,
      minPeriods: Int): Column =
    when(count(countedCol).over(frame) >= minPeriods, value)

  /** Algebraic rolling aggregate over a fixed window of `window` rows. */
  def rollingAgg(
      df: DataFrame,
      valueCol: Column,
      orderBy: Seq[Column],
      partitionBy: Seq[Column],
      window: Int,
      minPeriods: Option[Int] = None)(agg: Column => Column): DataFrame = {
    val frame = rollingFrame(orderBy, partitionBy, window)
    val mp = minPeriods.getOrElse(window)
    df.withColumn(
      "__rolling__",
      withMinPeriods(agg(valueCol).over(frame), valueCol, frame, mp))
  }

  /** Black-box rolling UDF: frame → Array[Double] → Scala function.
    * Memory per row is O(window); the UDF runs outside codegen (same
    * trade the reference makes for arbitrary Python).
    */
  def rollingCollect(
      df: DataFrame,
      valueCol: Column,
      orderBy: Seq[Column],
      partitionBy: Seq[Column],
      window: Int,
      outName: String)(f: Seq[Double] => Double): DataFrame = {
    val frame = rollingFrame(orderBy, partitionBy, window)
    val fUdf = udf(f)
    val arr = collect_list(valueCol).over(frame)
    df.withColumn(outName, when(size(arr) >= window, fUdf(arr)))
  }

  /** Algebraic expanding (cumulative) aggregate per group. */
  def expandingAgg(
      df: DataFrame,
      valueCol: Column,
      orderBy: Seq[Column],
      partitionBy: Seq[Column],
      outName: String)(agg: Column => Column): DataFrame =
    df.withColumn(outName, agg(valueCol).over(expandingFrame(orderBy, partitionBy)))
}
