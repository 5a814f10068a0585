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

  /** pandas fixed-window frame with full attribute replay (the reference
    * captures and re-applies `window/min_periods/center/closed` —
    * series_rolling.py:22-28, rolling_groupby.py:35-40). Frame bounds
    * follow pandas' FixedWindowIndexer exactly:
    *   - base frame ending at the current row: [-(w-1), 0]
    *   - center=true shifts both bounds forward by (w-1)/2
    *   - closed: "right" (default) keeps w rows; "both" extends the start
    *     one earlier (w+1 rows); "left" shifts the whole frame one back
    *     (w rows, excluding the current row); "neither" drops the current
    *     row (w-1 rows)
    */
  def rollingFrame(
      orderBy: Seq[Column],
      partitionBy: Seq[Column],
      window: Int,
      center: Boolean = false,
      closed: String = "right"): WindowSpec = {
    val base =
      if (partitionBy.isEmpty) Window.orderBy(orderBy: _*)
      else Window.partitionBy(partitionBy: _*).orderBy(orderBy: _*)
    val offset = if (center) (window - 1) / 2 else 0
    val (lo, hi) = closed match {
      case "right"   => (offset - window + 1, offset)
      case "both"    => (offset - window, offset)
      case "left"    => (offset - window, offset - 1)
      case "neither" => (offset - window + 1, offset - 1)
      case other =>
        throw new IllegalArgumentException(
          s"closed must be right|both|left|neither, got '$other'")
    }
    base.rowsBetween(lo, hi)
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

  /** Algebraic rolling aggregate over a fixed window of `window` rows,
    * with pandas attribute replay (center / closed / min_periods).
    */
  def rollingAgg(
      df: DataFrame,
      valueCol: Column,
      orderBy: Seq[Column],
      partitionBy: Seq[Column],
      window: Int,
      minPeriods: Option[Int] = None,
      center: Boolean = false,
      closed: String = "right")(agg: Column => Column): DataFrame = {
    val frame = rollingFrame(orderBy, partitionBy, window, center, closed)
    val mp = minPeriods.getOrElse(window)
    df.withColumn(
      "__rolling__",
      withMinPeriods(agg(valueCol).over(frame), valueCol, frame, mp))
  }

  /** Black-box rolling UDF: frame → Array[Double] → Scala function.
    * Memory per row is O(window); the UDF runs outside codegen (same
    * trade the reference makes for arbitrary Python). With
    * `minPeriods < window` the UDF sees shorter arrays near edges —
    * exactly pandas' rolling.apply contract.
    */
  def rollingCollect(
      df: DataFrame,
      valueCol: Column,
      orderBy: Seq[Column],
      partitionBy: Seq[Column],
      window: Int,
      outName: String,
      minPeriods: Option[Int] = None,
      center: Boolean = false,
      closed: String = "right",
      counter: Option[graft.progress.Progress.RowCounter] = None)(
      f: Seq[Double] => Double): DataFrame = {
    val frame = rollingFrame(orderBy, partitionBy, window, center, closed)
    val mp = minPeriods.getOrElse(window)
    // progress ticks once per UDF invocation (valid windows only) —
    // WindowExec's work unit is the row; the reference's per-group unit
    // (rolling_groupby.py:71-74) corresponds to the hash-exchange groups
    // the task listener already tracks
    val g = counter match {
      case None    => f
      case Some(c) => (xs: Seq[Double]) => { c.tick(); f(xs) }
    }
    val fUdf = udf(g)
    val arr = collect_list(valueCol).over(frame)
    df.withColumn(outName, when(size(arr) >= mp, fUdf(arr)))
  }

  /** Algebraic expanding (cumulative) aggregate per group. pandas
    * `expanding(min_periods=n)` (default 1) is replayed as a null
    * warm-up: output is null until the frame holds >= n observations
    * (the reference replays this attribute — expanding_groupby.py:35-40).
    */
  def expandingAgg(
      df: DataFrame,
      valueCol: Column,
      orderBy: Seq[Column],
      partitionBy: Seq[Column],
      outName: String,
      minPeriods: Int = 1)(agg: Column => Column): DataFrame = {
    val frame = expandingFrame(orderBy, partitionBy)
    val out =
      if (minPeriods > 1)
        withMinPeriods(agg(valueCol).over(frame), valueCol, frame, minPeriods)
      else agg(valueCol).over(frame)
    df.withColumn(outName, out)
  }

  /** pandas `win_type` weighted-window weights. `triang` matches
    * scipy.signal.windows.triang(M): even M → (2k+1)/M mirrored,
    * odd M → 2(k+1)/(M+1) mirrored.
    */
  def windowWeights(winType: String, window: Int): Seq[Double] = winType match {
    case "triang" =>
      val half =
        if (window % 2 == 0)
          (0 until window / 2).map(k => (2.0 * k + 1) / window)
        else
          (0 until (window + 1) / 2).map(k => 2.0 * (k + 1) / (window + 1))
      half ++ half.reverse.drop(window % 2)
    case "boxcar" => Seq.fill(window)(1.0)
    case other =>
      throw new IllegalArgumentException(s"unsupported win_type '$other'")
  }

  /** pandas `rolling(w, win_type=..., center=...).mean()` — weighted
    * window mean Σwᵢxᵢ / Σwᵢ, null under `window` rows (pandas requires
    * a full window for weighted means). `center` shifts the frame
    * forward by (w-1)/2, same as [[rollingFrame]]; negative lag = lead.
    * Declared as a sum of `lag` expressions: fully codegen'd, no array
    * materialization, scales like any window aggregate.
    */
  def rollingWeightedMean(
      df: DataFrame,
      valueCol: Column,
      orderBy: Seq[Column],
      partitionBy: Seq[Column],
      weights: Seq[Double],
      outName: String,
      center: Boolean = false): DataFrame = {
    val w = weights.length
    val offset = if (center) (w - 1) / 2 else 0
    val base =
      if (partitionBy.isEmpty) Window.orderBy(orderBy: _*)
      else Window.partitionBy(partitionBy: _*).orderBy(orderBy: _*)
    // weights index i = oldest..newest → lag distance (w-1-i) - offset
    val weighted = weights.zipWithIndex
      .map { case (wt, i) =>
        lag(valueCol, w - 1 - i - offset).over(base) * lit(wt)
      }
      .reduce(_ + _)
    val frame = base.rowsBetween(offset - w + 1, offset)
    df.withColumn(
      outName,
      when(count(valueCol).over(frame) >= w, weighted / lit(weights.sum)))
  }

  /** SCALABLE total-order rolling window — the distributed answer to the
    * one operator Spark's `WindowExec` cannot parallelize (an ungrouped
    * `Window.orderBy` collapses to a single partition).
    *
    * This is the reference's own overlapped-chunk protocol
    * (utils.py:9-58 `start_offset`, series_rolling.py:16,47) re-expressed
    * on Spark primitives:
    *   1. range-partition + sort by the order key (one exchange — the
    *      same cost any global sort pays);
    *   2. collect each partition's LAST (w-1) (order, value) pairs — a
    *      few KB per partition — and broadcast them;
    *   3. per partition, prepend the previous partition's tail, run the
    *      windows, and emit outputs only for own rows.
    * The sorted frame is locally checkpointed (eager, MEMORY_AND_DISK),
    * so the range exchange + sort runs ONCE and both passes (tails,
    * compute) read materialized blocks — at 100 TB a re-run of the global
    * sort would double the job. Blocks are freed by the ContextCleaner
    * when the frame goes out of scope. Output matches the
    * single-partition window exactly.
    *
    * @param orderCol  numeric total-order key (must be globally sortable)
    */
  def rollingGlobalScalable(
      df: DataFrame,
      orderCol: String,
      valueCol: String,
      window: Int,
      outName: String,
      numPartitions: Int = 0)(f: Seq[Double] => Double): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{DoubleType, StructField, StructType}

    val spark = df.sparkSession
    val n =
      if (numPartitions > 0) numPartitions
      else spark.sparkContext.defaultParallelism
    val sorted = df
      .repartitionByRange(n, col(orderCol))
      .sortWithinPartitions(orderCol)
      .select(col(orderCol).cast("long").as("__ord"), col(valueCol).cast("double").as("__v"))
      .localCheckpoint() // materialize the sort once; both passes reuse it

    // pass 1: last (w-1) values of each partition (KBs total). The carry
    // for partition i is the last (w-1) values of the WHOLE prefix —
    // chained driver-side so partitions smaller than w-1 rows stay
    // correct (their predecessor's tail alone would be short).
    val tails: Array[(Int, Array[Double])] = sorted.rdd
      .mapPartitionsWithIndex { (i, it) =>
        val buf = new scala.collection.mutable.ArrayDeque[Double](window)
        it.foreach { r =>
          buf.append(r.getDouble(1))
          if (buf.size > window - 1) buf.removeHead()
        }
        Iterator.single(i -> buf.toArray)
      }
      .collect()
    val byIndex = tails.sortBy(_._1).map(_._2)
    val carries: Array[Array[Double]] =
      byIndex.scanLeft(Array.empty[Double]) { (prefix, t) =>
        (prefix ++ t).takeRight(window - 1)
      } // carries(i) = last w-1 values before partition i
    val bCarries = spark.sparkContext.broadcast(carries)

    // pass 2: compute windows with the prefix carry prepended
    val outRows = sorted.rdd.mapPartitionsWithIndex { (i, it) =>
      val ring = new scala.collection.mutable.ArrayDeque[Double](window)
      bCarries.value(i).foreach(ring.append)
      it.map { r =>
        ring.append(r.getDouble(1))
        if (ring.size > window) ring.removeHead()
        val v: Any = if (ring.size >= window) f(ring.toSeq) else null
        Row(r.getLong(0), v)
      }
    }
    spark.createDataFrame(
      outRows,
      StructType(
        Seq(
          StructField("__ord", org.apache.spark.sql.types.LongType),
          StructField(outName, DoubleType))))
      .withColumnRenamed("__ord", orderCol)
  }
}
