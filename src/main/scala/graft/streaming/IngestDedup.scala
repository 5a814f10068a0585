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

  /** COMPACT the state table: rewrite every committed batch directory
    * into one consolidated directory (min id per fingerprint — the same
    * batching-invariant rule as ingestion) and delete the originals.
    * Run periodically: the ingestion loop adds one directory per
    * micro-batch, and a year of minutely batches is half a million
    * directories — listing cost grows without bound unless compacted.
    *
    * Safety: the consolidated directory commits with the same staged
    * write + rename as [[ingestBatch]], under `batch=c<maxId>` — a
    * namespace that can never collide with a FUTURE numeric stream
    * batch id (a compacted dir named `batch=<n>` would make the
    * stream's eventual batch n look already-committed and silently
    * drop it). Readers racing the post-commit deletes may briefly see
    * a fingerprint twice (once compacted, once in a not-yet-deleted
    * original) — harmless, the anti-join only asks membership; a crash
    * mid-delete is repaired by the next compact.
    */
  def compact(spark: SparkSession, statePath: String): Unit = {
    val root = new Path(statePath)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val batchDirs = fs
      .listStatus(root)
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("batch="))
      .map(_.getPath)
    if (batchDirs.length <= 1) return // nothing to consolidate
    val maxId = batchDirs
      .map(_.getName.stripPrefix("batch="))
      .collect { case s if s.forall(_.isDigit) && s.nonEmpty => s.toLong }
      .maxOption
      .getOrElse(0L)
    val target = new Path(root, s"batch=c$maxId")
    if (fs.exists(target)) {
      // this span is already compacted — repair a crash mid-delete by
      // removing dirs whose ids were folded into the committed c<maxId>
      // (ids > maxId arrived after the compaction and are untouched)
      batchDirs.filter(_.getName != target.getName).foreach { p =>
        val n = p.getName.stripPrefix("batch=").stripPrefix("c")
        if (n.nonEmpty && n.forall(_.isDigit) && n.toLong <= maxId)
          fs.delete(p, true)
      }
      return
    }
    val staging = new Path(root, s"_staging/compact-$maxId")
    fs.delete(staging, true)
    spark.read
      .parquet(batchDirs.toIndexedSeq.map(_.toString): _*)
      .groupBy("fp")
      .agg(min(col("id")).as("id"))
      .select("fp", "id")
      .write.mode("overwrite").parquet(staging.toString)
    if (!fs.rename(staging, target))
      throw new java.io.IOException(
        s"failed to commit compaction: rename $staging -> $target")
    batchDirs.foreach(p => fs.delete(p, true))
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
