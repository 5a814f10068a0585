package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming MATERIALIZED VIEW — incremental maintenance of a per-key
  * additive aggregate (n, sum, min, max) over an unbounded stream,
  * persisted as a queryable table. The third member of the
  * foreachBatch-state family: [[IngestDedup]] maintains a SET,
  * [[CdcUpsert]] maintains latest-version ROWS, this maintains
  * AGGREGATES — together the three state shapes a continuous pipeline
  * needs.
  *
  * Each micro-batch is reduced to per-key PARTIALS (one row per key in
  * the batch — the map-side-combine argument applied across time), then
  * merged with the persisted state by re-aggregation: n/sum add,
  * min/max fold. All moments are algebraic, so maintenance cost per
  * batch is O(batch + |touched keys|) and NEVER rescans history — the
  * property that makes a 100 TB-history view maintainable at all.
  * Averages and the like derive from (n, sum) at read time.
  *
  * Commit protocol: identical staged-directory + rename + marker as
  * [[CdcUpsert]] / [[SnapshotCommit]] (`snap=<id>` versions, committed
  * = marker present so object-store non-atomic renames can't publish a
  * partial snapshot, replay-idempotent, prune for retention). sum/minmax are computed on a LONG column (exact cents —
  * order-independent across replays and partitionings; q39's argument).
  */
object MatView {

  /** Merge one batch into the persisted view. Idempotent per
    * (viewPath, batchId).
    */
  def applyBatch(
      batch: DataFrame,
      viewPath: String,
      keys: Seq[String],
      valueCol: String,
      batchId: Long): Unit = {
    val spark = batch.sparkSession
    val root = new Path(viewPath)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val target = new Path(root, s"snap=$batchId")
    // committed on a previous attempt; an UNMARKED existing target is a
    // crashed partial publish and is rebuilt (SnapshotCommit.publish)
    if (SnapshotCommit.isCommitted(fs, target)) return
    val staging = new Path(root, s"_staging/snap-$batchId")
    fs.delete(staging, true)
    val partial = aggregateOf(batch, keys, col(valueCol))
    val merged = currentView(spark, viewPath) match {
      case None => partial
      case Some(state) =>
        state
          .unionByName(partial)
          .groupBy(keys.map(col): _*)
          .agg(
            sum(col("n")).as("n"),
            sum(col("s")).as("s"),
            min(col("mn")).as("mn"),
            max(col("mx")).as("mx"))
    }
    merged.write.mode("overwrite").parquet(staging.toString)
    SnapshotCommit.publish(fs, staging, target)
  }

  /** The batch-equivalent aggregate — also the oracle the streamed view
    * must converge to.
    */
  def aggregateOf(df: DataFrame, keys: Seq[String], value: Column): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(
        count(value).as("n"),
        sum(value).as("s"),
        min(value).as("mn"),
        max(value).as("mx"))

  /** The latest committed view, or None before the first commit. */
  def currentView(spark: SparkSession, viewPath: String): Option[DataFrame] = {
    val root = new Path(viewPath)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    SnapshotCommit
      .committed(fs, root)
      .sortBy(_._1)
      .lastOption
      .map { case (_, p) => spark.read.parquet(p.toString) }
  }

  /** Run the view-maintenance loop over a stream. */
  def start(
      stream: DataFrame,
      viewPath: String,
      checkpointDir: String,
      keys: Seq[String],
      valueCol: String): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        applyBatch(batch, viewPath, keys, valueCol, batchId)
      }
      .start()
}
