package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.functions.TextFunctions

/** Streaming INGESTION dedup — the continuous form of
  * [[graft.operators.Dedup.incrementalNew]]: each micro-batch is
  * fingerprinted, deduped within itself (min id per fingerprint, so the
  * result is batching-invariant), anti-joined against the PERSISTED
  * fingerprint table, and the survivors are committed to that table.
  *
  * State lives in a parquet table, not executor memory: history can be
  * 100 TB while each micro-batch shuffles only its own fingerprints —
  * the standard "dedup against the lake" ingestion loop.
  *
  * COMMIT PROTOCOL (exactly-once state): each batch's survivors are
  * written to a hidden staging directory (`_staging/batch-<id>` —
  * underscore-prefixed paths are invisible to Spark's file listing,
  * so a half-written attempt can never be read as state), then
  * published with ONE directory rename to `batch=<id>` — atomic on
  * HDFS and POSIX filesystems. Replay of an already-committed batch id
  * finds the target directory and is a no-op; a crash before the
  * rename leaves only staging garbage, which the retry deletes first.
  * Net: any interleaving of crash + replay yields each batch's rows in
  * the state exactly once. (On object stores where directory rename is
  * copy-based, front this with a transactional table format — the loop
  * shape is unchanged.) The `batch=<id>` layout doubles as hive-style
  * partitioning, so time-travel ("state as of batch N") is a partition
  * filter.
  */
object IngestDedup {

  /** One micro-batch step (also usable directly for batch backfill —
    * pass a monotonically increasing `batchId`, e.g. the day number).
    * Idempotent per (statePath, batchId): replaying a committed batch
    * is a no-op.
    */
  def ingestBatch(
      batch: DataFrame,
      statePath: String,
      textCol: String,
      idCol: String,
      batchId: Long): Unit = {
    val spark = batch.sparkSession
    val root = new Path(statePath)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val target = new Path(root, s"batch=$batchId")
    if (fs.exists(target)) return // committed on a previous attempt
    val staging = new Path(root, s"_staging/batch-$batchId")
    fs.delete(staging, true) // clear a crashed partial attempt
    val intra = batch
      .select(
        col(idCol).as("id"),
        TextFunctions.normFingerprint(col(textCol)).as("fp"))
      .groupBy("fp")
      .agg(min(col("id")).as("id"))
    val fresh = seenFingerprints(spark, statePath) match {
      case Some(seen) => intra.join(seen.select("fp"), Seq("fp"), "left_anti")
      case None       => intra
    }
    fresh.select("fp", "id").write.mode("overwrite").parquet(staging.toString)
    if (!fs.rename(staging, target))
      throw new java.io.IOException(
        s"failed to commit ingest batch $batchId: rename $staging -> $target")
  }

  /** The persisted fingerprint set, or None before the first commit. */
  def seenFingerprints(
      spark: SparkSession,
      statePath: String): Option[DataFrame] =
    try Some(spark.read.parquet(statePath))
    catch { case _: org.apache.spark.sql.AnalysisException => None }

  /** Run the ingestion loop over a document stream. The streaming
    * checkpoint makes batch ids stable across restarts, and
    * [[ingestBatch]]'s rename commit makes each id's state append
    * atomic — together: exactly-once state under replay.
    */
  def start(
      stream: DataFrame,
      statePath: String,
      checkpointDir: String,
      textCol: String = "text",
      idCol: String = "doc_id"): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        ingestBatch(batch, statePath, textCol, idCol, batchId)
      }
      .start()
}
