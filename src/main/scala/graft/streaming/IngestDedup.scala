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
  * published via [[SnapshotCommit]]: rename + zero-byte commit marker.
  * A batch is committed IFF its marker exists — a bare "target dir
  * exists" check would make a crashed partial object-store rename
  * (copy+delete, not atomic) look committed and silently lose the
  * batch's fingerprints forever. Replay of a committed id is a no-op;
  * an unmarked target is a crashed attempt, deleted and rebuilt. Net:
  * any interleaving of crash + replay yields each batch's rows in the
  * state exactly once. The `batch=<id>` layout doubles as hive-style
  * partitioning, so time-travel ("state as of batch N") is a partition
  * filter.
  *
  * Null-text rows fingerprint as EMPTY text (the [[graft.operators
  * .Dedup.exact]] convention): a null `fp` would never equal itself in
  * the anti-join, so null-text docs would re-ingest as "new" in every
  * batch and the state would grow one null row per batch forever.
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
    if (SnapshotCommit.isCommitted(fs, target)) return
    // an unmarked target is a crashed partial publish — delete it
    // BEFORE the probe (it would otherwise be read as state and flag
    // this batch's own rows as already seen)
    fs.delete(target, true)
    val staging = new Path(root, s"_staging/batch-$batchId")
    fs.delete(staging, true) // clear a crashed partial attempt
    val intra = batch
      .select(
        col(idCol).as("id"),
        TextFunctions
          .normFingerprint(coalesce(col(textCol), lit("")))
          .as("fp"))
      .groupBy("fp")
      .agg(min(col("id")).as("id"))
    val fresh = seenFingerprints(spark, statePath) match {
      case Some(seen) => intra.join(seen.select("fp"), Seq("fp"), "left_anti")
      case None       => intra
    }
    fresh.select("fp", "id").write.mode("overwrite").parquet(staging.toString)
    SnapshotCommit.publish(fs, staging, target)
  }

  /** COMPACT the state table: rewrite every committed batch directory
    * into one consolidated directory (min id per fingerprint — the same
    * batching-invariant rule as ingestion) and TOMBSTONE the originals
    * (data files deleted, commit markers kept: the markers are
    * [[ingestBatch]]'s replay-idempotence state — the
    * [[SegmentCompaction]] argument, though exact dedup would also
    * self-heal since a replayed batch's fingerprints all match state).
    * Run periodically: the ingestion loop adds one directory per
    * micro-batch, and a year of minutely batches is half a million
    * directories — listing cost grows without bound unless compacted.
    *
    * Safety: the consolidated directory commits marker-published under
    * `batch=c<maxId>` — a namespace that can never collide with a
    * FUTURE numeric stream batch id (a compacted dir named `batch=<n>`
    * would make the stream's eventual batch n look already-committed
    * and silently drop it). SINGLE-WRITER, like the ingest loop itself:
    * run compaction from the same process between batches (or with the
    * stream stopped). A reader whose plan listed the original files
    * before the fold deletes them would die on FileNotFoundException —
    * the "membership answer is unchanged" argument holds at the logical
    * layer only, not at Spark's file-listing layer.
    */
  def compact(spark: SparkSession, statePath: String): Unit = {
    val root = new Path(statePath)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def committedDirs: Array[Path] = fs
      .listStatus(root)
      .filter(s =>
        s.isDirectory && s.getPath.getName.startsWith("batch=") &&
          SnapshotCommit.isCommitted(fs, s.getPath))
      .map(_.getPath)
    val batchDirs = committedDirs
    if (batchDirs.length <= 1) return // nothing to consolidate
    val maxId = batchDirs
      .map(_.getName.stripPrefix("batch=").stripPrefix("c"))
      .collect { case s if s.forall(_.isDigit) && s.nonEmpty => s.toLong }
      .maxOption
      .getOrElse(0L)
    val target = new Path(root, s"batch=c$maxId")
    def tombstoneFolded(): Unit =
      committedDirs.foreach { p =>
        val n = p.getName.stripPrefix("batch=").stripPrefix("c")
        if (p.getName != target.getName && n.nonEmpty &&
          n.forall(_.isDigit) && n.toLong <= maxId)
          fs.listStatus(p)
            .filter(f => f.isFile && !f.getPath.getName.startsWith("_"))
            .foreach(f => fs.delete(f.getPath, false))
      }
    if (SnapshotCommit.isCommitted(fs, target)) {
      tombstoneFolded() // repair a crash mid-fold
      return
    }
    // fold only dirs WITH data files (tombstones are marker-only)
    val dataDirs = batchDirs.filter(p =>
      fs.listStatus(p).exists(f =>
        f.isFile && !f.getPath.getName.startsWith("_")))
    if (dataDirs.isEmpty) return
    val staging = new Path(root, s"_staging/compact-$maxId")
    fs.delete(staging, true)
    spark.read
      .parquet(dataDirs.toIndexedSeq.map(_.toString): _*)
      .groupBy("fp")
      .agg(min(col("id")).as("id"))
      .select("fp", "id")
      .write.mode("overwrite").parquet(staging.toString)
    SnapshotCommit.publish(fs, staging, target)
    tombstoneFolded()
  }

  /** The persisted fingerprint set, or None before the first commit.
    * Detection is EXPLICIT (committed batch dirs with data files) —
    * swallowing every AnalysisException as "no state yet" would turn a
    * real read failure into silently-disabled dedup that admits the
    * whole stream as fresh.
    */
  def seenFingerprints(
      spark: SparkSession,
      statePath: String): Option[DataFrame] =
    if (!SegmentCompaction.hasSegments(spark, statePath)) None
    else Some(spark.read.parquet(statePath))

  /** Run the ingestion loop over a document stream. The streaming
    * checkpoint makes batch ids stable across restarts, and
    * [[ingestBatch]]'s marker commit makes each id's state append
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
