package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** LOG-STRUCTURED continuous MERGE — [[CdcUpsert]]'s fact-table twin.
  * CdcUpsert publishes a full snapshot per batch: write amplification
  * O(table), right for dimension/state tables, wrong for facts. Here
  * each change batch APPENDS as its own marker-committed segment
  * (`delta/batch=<id>` — write amplification O(batch)); reads FOLD the
  * committed segments latest-writer-wins; [[compact]] folds segments
  * into one (`delta/batch=c<maxId>`) so read amplification stays
  * bounded. The three pieces — marker-published append segments,
  * fold-on-read, tombstoning compaction — are the near-dup ingest
  * index protocol ([[SegmentCompaction]]/[[SnapshotCommit]]) applied
  * to CDC state: the same crash/replay discipline, one tree instead of
  * two.
  *
  * FOLD ORDER (must equal [[CdcUpsert]]'s sequential merges): per key
  * the winner is the row with the greatest (batchId, version,
  * remaining-columns) — batch FIRST, because
  * [[graft.operators.Upsert.merge]] drops a key's old snapshot row
  * whenever a later batch touches the key, even with a LOWER version;
  * version only orders within a batch. The batch id rides in each
  * segment as a `__batch` column (a hive partition value would read
  * back as a string once `c<maxId>` segments exist, breaking numeric
  * order). A winning delete row makes the key absent.
  *
  * Compacted segments KEEP delete tombstone rows (state bounded by
  * deleted-key count): a crash mid-tombstoning leaves folded originals
  * readable next to `c<maxId>`, and if the fold had dropped a delete,
  * a not-yet-tombstoned original insert of that key would resurrect it
  * during the repair window. Replay of a folded batch id no-ops on its
  * kept marker — the [[SegmentCompaction]] tombstone argument.
  *
  * Exactly-once: the streaming checkpoint keeps batch ids stable;
  * replay of a committed id is a marker no-op; a partial publish is
  * deleted and rebuilt. Single-writer per log (the foreachBatch
  * contract) — a crash protocol, not a concurrency protocol.
  */
object CdcLog {

  private val Internal = "__batch"

  private def deltaRoot(logPath: String) = new Path(logPath, "delta")

  // segment-name parsing, committed-segment listing, and the
  // tombstone/stale-fold reclaim all live in SegmentCompaction — one
  // implementation of the marker protocol for every log-structured tree
  import SegmentCompaction.{
    committedSegs, dropStaleFolds, dropStaleStaging, segId, tombstoneFolded
  }

  /** Append one change batch as a committed segment. Idempotent per
    * (logPath, batchId); never reads existing state — the O(batch)
    * write path.
    */
  def appendBatch(
      changes: DataFrame,
      logPath: String,
      keys: Seq[String],
      versionCol: String,
      deleteCol: String,
      batchId: Long): Unit = {
    require(keys.nonEmpty, "appendBatch requires at least one key column")
    require(
      (keys :+ versionCol :+ deleteCol).forall(changes.columns.contains),
      s"changes must carry ${keys.mkString(",")} + $versionCol + $deleteCol")
    require(
      !changes.columns.contains(Internal),
      s"$Internal is reserved for the log's fold order — a change feed " +
        "carrying it would be silently overwritten and then dropped on read")
    val spark = changes.sparkSession
    val root = new Path(logPath)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val target = new Path(deltaRoot(logPath), s"batch=$batchId")
    if (SnapshotCommit.isCommitted(fs, target)) return
    val staging = new Path(root, s"_staging/delta-$batchId")
    fs.delete(staging, true)
    changes
      .withColumn(Internal, lit(batchId))
      .write
      .mode("overwrite")
      .parquet(staging.toString)
    SnapshotCommit.publish(fs, staging, target)
  }

  /** Winner-per-key fold over segment rows: greatest (__batch, version,
    * remaining columns) — the [[graft.operators.Upsert.merge]] total
    * order with the batch dimension prepended. Keeps delete rows
    * (callers filter); duplicate winner rows (compaction repair window)
    * collapse because row_number picks one of the identical copies.
    */
  private def fold(
      all: DataFrame,
      keys: Seq[String],
      versionCol: String): DataFrame = {
    val ord = col(Internal).desc +: col(versionCol).desc +:
      all.columns
        .filterNot(c =>
          keys.contains(c) || c == versionCol || c == Internal)
        .toSeq
        .map(col(_).desc)
    all
      .withColumn(
        "__rn",
        row_number().over(
          Window.partitionBy(keys.map(col): _*).orderBy(ord: _*)))
      .where(col("__rn") === 1)
      .drop("__rn")
  }

  /** The folded current table (latest-writer-wins, deletes applied) —
    * schema = change schema minus (version, delete) columns, i.e.
    * exactly [[CdcUpsert.currentSnapshot]]'s. None before the first
    * committed segment.
    */
  def read(
      spark: SparkSession,
      logPath: String,
      keys: Seq[String],
      versionCol: String = "version",
      deleteCol: String = "deleted"): Option[DataFrame] =
    readAt(spark, logPath, keys, Long.MaxValue, versionCol, deleteCol)

  /** Time travel: the folded table AS OF `asOfBatch` — the fold
    * restricted to committed segments with id <= asOfBatch, i.e.
    * exactly the state [[read]] returned right after that batch
    * committed. History reaches back only to the newest compaction:
    * `batch=c<id>` holds per-key WINNERS as of id, so a state before
    * id is not reconstructible from it — a committed compacted segment
    * with id > asOfBatch fails loudly rather than returning the
    * partial fold of whatever originals happen to survive tombstoning
    * (the vacuum-limits-time-travel contract). None before the first
    * eligible segment.
    */
  def readAt(
      spark: SparkSession,
      logPath: String,
      keys: Seq[String],
      asOfBatch: Long,
      versionCol: String = "version",
      deleteCol: String = "deleted"): Option[DataFrame] = {
    val root = deltaRoot(logPath)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val foldedPast = committedSegs(fs, root)
      .filter(_.getName.startsWith("batch=c"))
      .flatMap(segId(_))
      .filter(_ > asOfBatch)
    require(
      foldedPast.isEmpty,
      s"state as of batch $asOfBatch is folded into batch=c${foldedPast.max}" +
        " — compaction keeps only per-key winners, so time travel reaches" +
        " back only to the newest compacted id")
    val segs = committedSegs(fs, root, withData = true)
      .filter(segId(_).exists(_ <= asOfBatch))
    if (segs.isEmpty) None
    else {
      val all = spark.read.parquet(segs.map(_.toString).toIndexedSeq: _*)
      val outCols = all.columns.toSeq
        .filterNot(c => c == versionCol || c == deleteCol || c == Internal)
      Some(
        fold(all, keys, versionCol)
          .where(!coalesce(col(deleteCol), lit(false)))
          .select(outCols.map(col): _*))
    }
  }

  /** Fold every committed segment into one `batch=c<maxId>` segment
    * holding the per-key winners (delete tombstone rows INCLUDED — see
    * the class doc for the repair-window argument), then tombstone the
    * folded originals to marker-only dirs. Crash-safe and replayable:
    * a committed target means the span is folded (finish tombstoning
    * and return); a crash mid-write leaves an unmarked target the next
    * call rebuilds.
    */
  def compact(
      spark: SparkSession,
      logPath: String,
      keys: Seq[String],
      versionCol: String = "version"): Unit = {
    val root = deltaRoot(logPath)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val segs = committedSegs(fs, root, withData = true)
    if (segs.length <= 1) return
    val maxId = segs.flatMap(segId(_)).maxOption.getOrElse(return)
    val target = new Path(root, s"batch=c$maxId")
    if (SnapshotCommit.isCommitted(fs, target)) {
      tombstoneFolded(fs, root, maxId) // repair a crash mid-tombstoning
      return
    }
    dropStaleFolds(fs, root, maxId)
    dropStaleStaging(
      fs, new Path(logPath, "_staging"), "compact-", s"compact-$maxId")
    val staging = new Path(logPath, s"_staging/compact-$maxId")
    fs.delete(staging, true)
    fold(spark.read.parquet(segs.map(_.toString).toIndexedSeq: _*),
      keys,
      versionCol)
      .write
      .mode("overwrite")
      .parquet(staging.toString)
    SnapshotCommit.publish(fs, staging, target)
    tombstoneFolded(fs, root, maxId)
  }

  /** Run the append loop over a change stream — checkpointed batch ids
    * + marker commits = exactly-once log state under replay.
    */
  def start(
      changes: DataFrame,
      logPath: String,
      checkpointDir: String,
      keys: Seq[String],
      versionCol: String = "version",
      deleteCol: String = "deleted"): StreamingQuery =
    changes.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        appendBatch(batch, logPath, keys, versionCol, deleteCol, batchId)
      }
      .start()
}
