package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Ordered funnel analysis — the event-pipeline conversion rollup. A
  * user reaches stage k at the EARLIEST event of stage k's type that is
  * at-or-after the time they reached stage k−1 (sequential min-time
  * chaining: later stages can't be satisfied by earlier events —
  * "purchase before first view" doesn't convert).
  *
  * Shape: one filtered aggregation per stage over the (user, time)
  * pairs, each joined to the previous stage's one-row-per-user reach
  * frame (co-partitioned on the user key — every stage hashes on the
  * same column, and the reach side is |users| rows, bounded). Each
  * stage's reach frame is materialized once ([[graft.ops.Stage]]) so an
  * N-stage funnel is N passes, not N². Returns (stage, stage_idx,
  * n_users).
  */
object Funnel {

  def stages(
      df: DataFrame,
      userCol: String,
      typeCol: Column,
      timeCol: Column,
      stageTypes: Seq[String]): DataFrame = {
    require(stageTypes.nonEmpty, "need at least one funnel stage")
    var reached: DataFrame = null
    val counts = stageTypes.zipWithIndex.map { case (st, i) =>
      val evs = df
        .where(typeCol === st)
        .select(col(userCol), timeCol.as("__et"))
      val cur =
        if (i == 0)
          evs.groupBy(userCol).agg(min(col("__et")).as("__t"))
        else
          evs
            .join(reached.withColumnRenamed("__t", "__prev"), Seq(userCol))
            .where(col("__et") >= col("__prev"))
            .groupBy(userCol)
            .agg(min(col("__et")).as("__t"))
      reached = graft.ops.Stage.materializeOnce(cur)
      reached
        .agg(count(lit(1)).as("n_users"))
        .select(
          lit(st).as("stage"),
          lit(i).as("stage_idx"),
          col("n_users"))
    }
    counts.reduce(_ unionByName _)
  }
}
