package graft.ops

import org.apache.spark.TaskContext
import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Scalable global row numbering — the distributed answer to
  * `row_number() OVER (ORDER BY ...)`, which Spark plans as an Exchange
  * SinglePartition + one WindowExec: the whole dataset funnels through
  * one task (the q09-vs-q30 problem, for ranks).
  *
  * Shape (same range-partition trick as [[Windows.rollingGlobalScalable]]):
  *
  *  1. `repartitionByRange` on the sort key — partition i holds keys
  *     strictly below partition i+1 (sampled range bounds), each sorted
  *     internally. The ONLY full-data exchange.
  *  2. a counts pass over the materialized ranges — `spark_partition_id`
  *     groupBy, #partitions rows to the driver; prefix-summed into
  *     per-partition rank offsets.
  *  3. one `mapPartitions` appending `offset(pid) + local index` — no
  *     further shuffle, no single-partition stage anywhere.
  *
  * The sort key must be a total order (add a unique tiebreak column) or
  * ranks of tied rows depend on partition placement.
  *
  * mapPartitions (brief preference (d)) is justified here: the rank is
  * a per-partition stateful scan with a cross-partition offset — not
  * expressible as a Column without the very single-partition window
  * this exists to avoid.
  */
object GlobalRank {

  /** Append `outName` = 1-based global rank under `sortCols`. */
  def withGlobalRowNumber(
      df: DataFrame,
      sortCols: Seq[Column],
      outName: String = "rk"): DataFrame =
    withGlobalRowNumberTotal(df, sortCols, outName)._1

  /** [[withGlobalRowNumber]] plus the TOTAL row count — already known
    * from the offsets pass, so rank-relative consumers (deciles,
    * percentile cuts: `(rk-1)*k div total`) get it for free instead of
    * running their own count aggregation + broadcast join.
    */
  def withGlobalRowNumberTotal(
      df: DataFrame,
      sortCols: Seq[Column],
      outName: String = "rk"): (DataFrame, Long) = {
    val ranged = df
      .repartitionByRange(sortCols: _*)
      .sortWithinPartitions(sortCols: _*)
      // two consumers (counts pass + rank pass) — materialize the sorted
      // ranges once instead of re-sorting per consumer
      .transform(Stage.materializeOnce)

    val counts: Map[Int, Long] = ranged
      .groupBy(spark_partition_id().as("pid"))
      .count()
      .collect()
      .map(r => r.getInt(0) -> r.getLong(1))
      .toMap
    val nParts = ranged.rdd.getNumPartitions
    val offsets = new Array[Long](nParts + 1)
    (0 until nParts).foreach { i =>
      offsets(i + 1) = offsets(i) + counts.getOrElse(i, 0L)
    }

    val outSchema = StructType(
      ranged.schema.fields :+ StructField(outName, LongType, nullable = false))
    implicit val enc: ExpressionEncoder[Row] = ExpressionEncoder(outSchema)
    val ranked = ranged.mapPartitions { it =>
      val pid = TaskContext.getPartitionId()
      var r = offsets(pid)
      it.map { row =>
        r += 1
        Row.fromSeq(row.toSeq :+ r)
      }
    }
    (ranked, offsets(nParts))
  }
}
