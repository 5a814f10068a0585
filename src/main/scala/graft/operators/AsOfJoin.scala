package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join with full pandas `merge_asof` direction/tolerance parity:
  * for each left row, attach the closest right row within the same key —
  * `direction = "backward"` (most recent right with t' <= t: the
  * point-in-time join every feature/training pipeline needs, no
  * look-ahead leakage), `"forward"` (next right with t' >= t), or
  * `"nearest"` (closer of the two; backward wins exact-distance ties,
  * like pandas). An optional `tolerance` nulls out matches farther than
  * the bound (pandas `tolerance` — the row is kept, the payload is
  * null); its unit is MICROSECONDS for timestamp/date time columns and
  * the column's own units for numeric time columns.
  *
  * Spark has no native as-of join; the composition ladder (brief
  * preference (a)) gives a fully scalable one: tag both sides, union,
  * and carry the nearest right payload across with
  * `last(_, ignoreNulls)` over the unbounded-preceding frame (backward)
  * / `first(_, ignoreNulls)` over the unbounded-following frame
  * (forward). Cost: ONE hash exchange on the key + per-partition sort —
  * the same plan shape as a sort-merge join, with none of the range-join
  * pair explosion ("nearest" adds the second frame's sort, still zero
  * extra exchanges). Skewed keys behave like any window partition (one
  * task per key's run).
  *
  * Ties (right.t == left.t) match in every direction (pandas
  * `allow_exact_matches=True` default), and among right rows sharing a
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
    * @param direction backward | forward | nearest
    * @param tolerance max |leftTime − matched rightTime| (µs for
    *                  timestamp/date times, native units for numeric
    *                  times); farther matches null out
    */
  def apply(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTime: Column,
      rightTime: Column,
      payload: Seq[String],
      tieBreak: String,
      direction: String = "backward",
      tolerance: Option[Long] = None): DataFrame = {
    require(
      Set("backward", "forward", "nearest")(direction),
      s"direction must be backward|forward|nearest, got '$direction'")
    val leftCols = left.columns.toSeq

    // deduplicate right to one row per (key, t): greatest tie-break wins.
    // Null right times are dropped FIRST — a (key, null) group would
    // sort before every left row in the backward window and get picked
    // by last(ignoreNulls) as a spurious "earlier" match when no real
    // right row precedes (pandas merge_asof drops NaT right keys too)
    val r1 = right
      .where(rightTime.isNotNull)
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

    // backward frame: right rows sort BEFORE left at equal time, so the
    // unbounded-preceding frame of a left row sees same-instant rights
    val wb = Window
      .partitionBy(col(key))
      .orderBy(col("__t"), col("__isL"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // forward frame: the mirrored tie order (left BEFORE right) so the
    // unbounded-following frame sees same-instant rights. Different sort
    // key, same partitioning — a second per-partition sort, no exchange.
    val wf = Window
      .partitionBy(col(key))
      .orderBy(col("__t").asc, col("__isL").desc)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)

    val unioned = lTagged
      .select(rTagged.columns.toIndexedSeq.map(col): _*)
      .unionByName(rTagged.select(rTagged.columns.toIndexedSeq.map(col): _*))
      .withColumn(
        "__c",
        when(
          col("__isL") === 0,
          struct(col("__t").as("__mt"), col("__p").as("__pp"))))

    val numericTime = unioned
      .schema("__t").dataType
      .isInstanceOf[org.apache.spark.sql.types.NumericType]
    def micros(c: Column): Column =
      if (numericTime) c else unix_micros(c.cast("timestamp"))
    val lt = micros(col("__t"))
    val withMatch = direction match {
      case "backward" =>
        unioned.withColumn("__m", last(col("__c"), ignoreNulls = true).over(wb))
      case "forward" =>
        unioned.withColumn("__m", first(col("__c"), ignoreNulls = true).over(wf))
      case "nearest" =>
        unioned
          .withColumn("__mb", last(col("__c"), ignoreNulls = true).over(wb))
          .withColumn("__mf", first(col("__c"), ignoreNulls = true).over(wf))
          .withColumn(
            "__m",
            when(col("__mb").isNull, col("__mf"))
              .when(col("__mf").isNull, col("__mb"))
              .when( // backward wins exact-distance ties (pandas)
                lt - micros(col("__mb.__mt")) <=
                  micros(col("__mf.__mt")) - lt,
                col("__mb"))
              .otherwise(col("__mf")))
    }
    val bounded = tolerance match {
      case None => withMatch
      case Some(tol) =>
        withMatch.withColumn(
          "__m",
          when(abs(lt - micros(col("__m.__mt"))) <= tol, col("__m")))
    }
    bounded
      .where(col("__isL") === 1)
      .select(
        leftCols.map(col) ++
          (tieBreak +: payload.filterNot(_ == tieBreak))
            .map(c => col(s"__m.__pp.$c").as(c)): _*)
  }
}
