package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) data layout — multi-dimensional file skipping.
  *
  * Sorting a table by ONE column gives parquet footers tight min/max
  * ranges for that column only: a predicate on it prunes row groups,
  * a predicate on any other column scans everything. A 100-TB curation
  * corpus is queried along several axes at once (quality score AND
  * token count, date AND source); linear sort can serve exactly one.
  *
  * The Z-order key interleaves the bits of k normalized columns, so
  * rows close in z-value are close in EVERY dimension. Range-partition
  * + locally sort by z, and each written file covers a small k-dim
  * bounding box — a conjunctive range predicate overlaps few boxes, and
  * parquet's ordinary column min/max stats (no special metadata) let the
  * scan skip the rest. This is the Delta/Iceberg `OPTIMIZE ZORDER BY`
  * idea expressed with nothing but built-in bitwise expressions, a
  * range exchange, and a local sort: no UDF, no custom writer, and the
  * skipping needs zero reader cooperation beyond normal pushdown.
  *
  * Everything here is deterministic (min-max normalization, fixed bit
  * budget), so layouts are reproducible and — because layout never
  * changes RESULTS, only IO — every query over a z-ordered copy remains
  * oracle-checkable against the original table.
  *
  * Scale posture: the only non-narrow steps are one k-value min/max agg
  * (one row to the driver) and the single range exchange every layout
  * rewrite needs anyway. ZOrderSpec proves the payoff from the written
  * footers themselves: overlap-counting file min/max boxes against a
  * box predicate, z-order vs linear sort.
  */
object ZOrder {

  /** Morton interleave of `cols` already normalized to `[0, 2^bits)`
    * integers: bit i of column c lands at position `i * k + c`. Pure
    * shift/mask/OR tree — codegen folds it into straight-line long ops.
    * `bits * k` must fit a signed long (≤ 63).
    */
  def interleaveBits(cols: Seq[Column], bits: Int): Column = {
    val k = cols.size
    require(k >= 1, "need at least one column")
    require(bits >= 1 && bits * k <= 63, s"bits*k must be in [1,63], got ${bits * k}")
    val terms = for {
      (c, ci) <- cols.zipWithIndex
      i <- 0 until bits
    } yield shiftleft(
      shiftright(c, i).bitwiseAND(lit(1L)),
      i * k + ci)
    terms.reduce((a, b) => a.bitwiseOR(b))
  }

  /** Normalize a column to `[0, 2^bits)` by linear min-max scaling.
    * `min`/`max` are plain columns (usually literals from a stats pass).
    * Nulls, NaNs, and degenerate ranges (min == max) map to 0 — none
    * carries ordering information, and under ANSI mode an unguarded
    * NaN→long cast would fail the job instead of degrading the layout.
    */
  def normalizeToBits(c: Column, min: Column, max: Column, bits: Int): Column = {
    val span = max.cast("double") - min.cast("double")
    val top = (1L << bits) - 1
    val scaled = nanvl(
      ((c.cast("double") - min.cast("double")) / span) * top,
      lit(0d))
    when(c.isNull || c.cast("double").isNaN || span <= 0d, lit(0L))
      .otherwise(least(greatest(round(scaled), lit(0d)), lit(top.toDouble)).cast("long"))
  }

  /** The z-value column for `zCols` of `df`, min-max normalized from a
    * one-row stats pass (driver receives 2k doubles — meta-sized).
    */
  def zValue(df: DataFrame, zCols: Seq[String], bits: Int): Column = {
    val aggs = zCols
      .flatMap(c => Seq(min(col(c)).cast("double"), max(col(c)).cast("double")))
      .zipWithIndex
      .map { case (c, i) => c.as(s"s$i") }
    val stats = df.agg(aggs.head, aggs.tail: _*).head()
    // An empty table or an all-null z-column yields null min/max;
    // getDouble would NPE. Fall back to (0, 0) — the degenerate-range
    // path normalizeToBits already promises (span <= 0 → every row
    // maps to 0, the column simply carries no ordering information).
    def statOr0(i: Int): Double =
      if (stats.isNullAt(i)) 0d else stats.getDouble(i)
    val normalized = zCols.zipWithIndex.map { case (c, i) =>
      val lo = statOr0(2 * i)
      val hi = statOr0(2 * i + 1)
      normalizeToBits(col(c), lit(lo), lit(hi), bits)
    }
    interleaveBits(normalized, bits)
  }

  /** Write `df` as `numFiles` parquet files clustered on the Z-order of
    * `zCols`: range-partition by z (file i's z-range is strictly below
    * file i+1's), sort within each file, drop the helper column. Footer
    * min/max of every `zCols` member is tight per file — conjunctive
    * range predicates on any subset of them skip files via ordinary
    * parquet pushdown.
    */
  def writeZOrdered(
      df: DataFrame,
      path: String,
      zCols: Seq[String],
      bits: Int = 12,
      numFiles: Int = 32): Unit = {
    val z = zValue(df, zCols, bits)
    df.withColumn("__z", z)
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write
      .mode("overwrite")
      .parquet(path)
  }

  /** File-level pruning evidence, read from the layout's own parquet
    * footers: for each data file, the per-column [min,max] intervals of
    * `ranges`' columns form a bounding box; a file whose box intersects
    * every queried interval MUST be read, every other file is skipped
    * by stats pushdown. Returns (filesTotal, filesOverlapping). The
    * footprint a scan cannot beat — and the number ZOrderSpec compares
    * between layouts.
    */
  def fileOverlapCount(
      spark: SparkSession,
      path: String,
      ranges: Map[String, (Double, Double)]): (Int, Int) = {
    import org.apache.hadoop.fs.Path
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    val conf = spark.sparkContext.hadoopConfiguration
    val dir = new Path(path)
    val fs = dir.getFileSystem(conf)
    val files = fs.listStatus(dir).map(_.getPath)
      .filter(p => p.getName.endsWith(".parquet"))
    var overlapping = 0
    files.foreach { p =>
      val reader = ParquetFileReader.open(HadoopInputFile.fromPath(p, conf))
      try {
        import scala.jdk.CollectionConverters._
        val blocks = reader.getFooter.getBlocks.asScala
        // a file overlaps iff ANY of its row groups overlaps every range
        val fileOverlaps = blocks.exists { b =>
          ranges.forall { case (name, (lo, hi)) =>
            b.getColumns.asScala
              .find(_.getPath.toDotString == name)
              .forall { cc =>
                val st = cc.getStatistics
                if (st == null || !st.hasNonNullValue) true
                else {
                  val mn = statToDouble(st.genericGetMin)
                  val mx = statToDouble(st.genericGetMax)
                  mx >= lo && mn <= hi
                }
              }
          }
        }
        if (fileOverlaps) overlapping += 1
      } finally reader.close()
    }
    (files.length, overlapping)
  }

  private def statToDouble(v: Any): Double = v match {
    case n: java.lang.Number => n.doubleValue()
    case other =>
      throw new IllegalArgumentException(
        s"non-numeric parquet statistic ${other.getClass}: layout pruning " +
          "evidence only supports numeric z-columns")
  }
}
