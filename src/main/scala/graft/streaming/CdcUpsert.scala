package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.Upsert

/** Continuous MERGE — the streaming form of [[Upsert.merge]]: a change
  * stream (CDC feed: upserts + deletes, versioned) drains into a
  * persisted snapshot via `foreachBatch`, producing the table a
  * `MERGE INTO` target would hold. The streaming checkpoint keeps batch
  * ids stable across restarts; the commit protocol below makes each
  * id's snapshot transition atomic — together: exactly-once state under
  * replay (the [[IngestDedup]] argument, applied to full-snapshot
  * state).
  *
  * COMMIT PROTOCOL: each batch merges the CURRENT committed snapshot
  * with its changes and writes the NEXT snapshot to a hidden staging
  * directory (`_staging/snap-<id>`, invisible to Spark's file listing),
  * then publishes it with a directory rename to `snap=<id>` followed by
  * a zero-byte commit marker ([[SnapshotCommit]] — "committed" means
  * marker present, NOT directory present, so the protocol survives
  * object stores where rename is copy+delete and a crash can leave a
  * partial target). Replay of a committed id finds the marker and is a
  * no-op; a crash before the marker leaves a partial target the retry
  * deletes and rebuilds; a crash before the rename leaves staging
  * garbage the retry deletes first. Readers
  * always see the highest committed `snap=<id>` — a complete,
  * consistent table version (the layout doubles as time travel:
  * "state as of batch N" is a directory pick). Old snapshots accumulate
  * until pruned — [[prune]] keeps the latest `keep` versions, the
  * retention knob every table format exposes.
  *
  * Scale note, stated honestly: without a table format, publishing a
  * snapshot rewrites the whole table per batch — right for dimension/
  * state tables (the common CDC target), wrong for fact tables, where a
  * transactional format's file-level MERGE takes over; the loop shape
  * and the merge semantics are unchanged.
  */
object CdcUpsert {

  /** Apply one change batch to the persisted snapshot. Idempotent per
    * (snapshotPath, batchId). Usable directly for batch backfill with
    * any monotonically increasing id.
    */
  def applyBatch(
      changes: DataFrame,
      snapshotPath: String,
      keys: Seq[String],
      versionCol: String,
      deleteCol: String,
      batchId: Long): Unit = {
    val spark = changes.sparkSession
    val root = new Path(snapshotPath)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val target = new Path(root, s"snap=$batchId")
    // committed on a previous attempt; an UNMARKED existing target is a
    // crashed partial publish and is rebuilt (SnapshotCommit.publish)
    if (SnapshotCommit.isCommitted(fs, target)) return
    val staging = new Path(root, s"_staging/snap-$batchId")
    fs.delete(staging, true) // clear a crashed partial attempt
    val template = changes.drop(versionCol, deleteCol).limit(0)
    val current = currentSnapshot(spark, snapshotPath).getOrElse(template)
    Upsert
      .merge(current, changes, keys, versionCol, deleteCol)
      .write
      .mode("overwrite")
      .parquet(staging.toString)
    SnapshotCommit.publish(fs, staging, target)
  }

  /** The latest committed snapshot, or None before the first commit. */
  def currentSnapshot(
      spark: SparkSession,
      snapshotPath: String): Option[DataFrame] = {
    val root = new Path(snapshotPath)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    SnapshotCommit
      .committed(fs, root)
      .sortBy(_._1)
      .lastOption
      .map { case (_, p) => spark.read.parquet(p.toString) }
  }

  /** Retention: delete all but the newest `keep` committed snapshots.
    * Readers racing a prune of the version they hold see the classic
    * retention hazard every table format documents — prune with a
    * retention window longer than any reader.
    */
  def prune(spark: SparkSession, snapshotPath: String, keep: Int): Unit = {
    require(keep >= 1, s"keep must be >= 1, got $keep")
    val root = new Path(snapshotPath)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    SnapshotCommit
      .committed(fs, root)
      .sortBy(-_._1)
      .drop(keep)
      .foreach { case (_, p) => fs.delete(p, true) }
  }

  /** Run the continuous-merge loop over a change stream. */
  def start(
      changes: DataFrame,
      snapshotPath: String,
      checkpointDir: String,
      keys: Seq[String],
      versionCol: String = "version",
      deleteCol: String = "deleted"): StreamingQuery =
    changes.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        applyBatch(batch, snapshotPath, keys, versionCol, deleteCol, batchId)
      }
      .start()
}
