package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for each left row, attach the most recent right row with
  * `rightTime <= leftTime` within the same key — the point-in-time join
  * every feature/training pipeline needs (no look-ahead leakage).
  *
  * Spark has no native as-of join; the composition ladder (brief
  * preference (a)) gives a fully scalable one: tag both sides, union,
  * and carry the last right payload forward with
  * `last(_, ignoreNulls).over(key-partitioned time window)`.
  * Cost: ONE hash exchange on the key + per-partition sort — the same
  * plan shape as a sort-merge join, with none of the range-join pair
  * explosion. Skewed keys behave like any window partition (one task
  * per key's run).
  *
  * Ties (right.t == left.t) match, and among right rows sharing a
  * timestamp the one with the greatest tie-break column wins —
  * deterministic regardless of partitioning.
  */
object AsOfJoin {

  /** @param left      probe side (events)
    * @param right     build side (state changes)
    * @param key       equi-join key column name (same name both sides)
    * @param leftTime  event-time column on the left
    * @param rightTime event-time column on the right
    * @param payload   right columns to attach
    * @param tieBreak  right column ordering ties at equal rightTime
    */
  def apply(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTime: Column,
      rightTime: Column,
      payload: Seq[String],
      tieBreak: String): DataFrame = {
    val leftCols = left.columns.toSeq

    // deduplicate right to one row per (key, t): greatest tie-break wins
    val r1 = right
      .groupBy(col(key), rightTime.as("__t"))
      .agg(max(struct((tieBreak +: payload.filterNot(_ == tieBreak))
        .map(col): _*)).as("__p"))

    val lTagged = left
      .withColumn("__t", leftTime)
      .withColumn("__isL", lit(1))
      .withColumn("__p", lit(null).cast(r1.schema("__p").dataType))
    val rTagged = r1
      .select(
        Seq(col(key), col("__t"), lit(0).as("__isL"), col("__p")) ++
          leftCols
            .filterNot(Set(key))
            .map(c => lit(null).cast(left.schema(c).dataType).as(c)): _*)

    // right rows sort before left rows at equal time → <= semantics
    val w = Window
      .partitionBy(col(key))
      .orderBy(col("__t"), col("__isL"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    lTagged
      .select(rTagged.columns.map(col): _*)
      .unionByName(rTagged.select(rTagged.columns.map(col): _*))
      .withColumn("__m", last(col("__p"), ignoreNulls = true).over(w))
      .where(col("__isL") === 1)
      .select(
        leftCols.map(col) ++
          (tieBreak +: payload.filterNot(_ == tieBreak))
            .map(c => col(s"__m.$c").as(c)): _*)
  }
}
