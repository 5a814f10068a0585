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
  * Commit protocol: identical staged-directory + rename as
  * [[CdcUpsert]] (`snap=<id>` versions, replay-idempotent, prune for
  * retention). sum/minmax are computed on a LONG column (exact cents —
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
    if (fs.exists(target)) return // committed on a previous attempt
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
    if (!fs.rename(staging, target))
      throw new java.io.IOException(
        s"failed to commit view snapshot $batchId: rename $staging -> $target")
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
    if (!fs.exists(root)) return None
    fs.listStatus(root)
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("snap="))
      .map(_.getPath.getName.stripPrefix("snap="))
      .collect { case s if s.nonEmpty && s.forall(_.isDigit) => s.toLong }
      .maxOption
      .map(id => spark.read.parquet(new Path(root, s"snap=$id").toString))
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
