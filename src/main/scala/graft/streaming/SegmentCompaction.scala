package graft.streaming

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Shared two-tree segment compaction for the persisted near-dup
  * indexes ([[NearDupIngest]] MinHash, [[EmbedIngest]] embedding-LSH):
  * fold every committed `sig/batch=<id>` + `buckets/batch=<id>` pair
  * into one `batch=c<maxId>` segment per tree, recomputing the buckets
  * from the folded signatures via the index-specific `rebucket`
  * function (banding is a pure function of the stored signature
  * column — no text or vectors are re-signed). Per-batch segments
  * carry batch-LOCAL bucket sizes, so the probes' `maxBucketSize`
  * skip-guard undercounts a hot bucket spread across many batches;
  * after compaction `bn` is exact over the folded span.
  *
  * Crash-safe, replayable at any point: signatures publish before
  * buckets (marker protocol), the fold set is deduplicated by id so a
  * replay that reads both a committed `c<maxId>` and a not-yet-emptied
  * folded original counts each doc once, and a crash mid-fold is
  * repaired on the next call (both targets committed → finish
  * tombstoning folded ids ≤ maxId). Folded segments are kept as
  * marker-only tombstones — the markers are the ingest loops'
  * replay-idempotence state (see `dropFolded`). A probe racing a
  * crashed half-fold may see a doc's buckets twice — harmless: a
  * duplicate near-dup flag row still anti-joins to the same decision.
  */
private[streaming] object SegmentCompaction {

  /** Numeric id of a `batch=<id>` / `batch=c<id>` segment dir. Shared
    * by every log-structured tree ([[NearDupIngest]]/[[EmbedIngest]]
    * indexes here, [[CdcLog]]'s delta log) so the segment-name protocol
    * can never diverge between them.
    */
  private[streaming] def segId(p: Path): Option[Long] = {
    val n = p.getName.stripPrefix("batch=").stripPrefix("c")
    if (n.nonEmpty && n.forall(_.isDigit)) Some(n.toLong) else None
  }

  /** Committed segment dirs under `tree`; `withData` keeps only those
    * with data files (tombstoned segments are marker-only).
    */
  private[streaming] def committedSegs(
      fs: FileSystem,
      tree: Path,
      withData: Boolean = false): Array[Path] =
    if (!fs.exists(tree)) Array.empty
    else
      fs.listStatus(tree)
        .filter(s =>
          s.isDirectory && s.getPath.getName.startsWith("batch=") &&
            SnapshotCommit.isCommitted(fs, s.getPath) &&
            (!withData || fs.listStatus(s.getPath).exists(f =>
              f.isFile && !f.getPath.getName.startsWith("_"))))
        .map(_.getPath)

  /** Tombstone every folded original under `tree`: data files deleted,
    * commit markers KEPT — the per-batch marker is the ingest loops'
    * replay-idempotence state (see [[compact]]'s tombstone argument).
    */
  private[streaming] def tombstoneFolded(
      fs: FileSystem,
      tree: Path,
      maxId: Long): Unit =
    committedSegs(fs, tree).foreach { p =>
      if (p.getName != s"batch=c$maxId" && segId(p).exists(_ <= maxId))
        fs.listStatus(p)
          .filter(f => f.isFile && !f.getPath.getName.startsWith("_"))
          .foreach(f => fs.delete(f.getPath, false))
    }

  /** Reclaim crashed-fold leftovers no future call would touch: an
    * UNMARKED `batch=c<old>` with old < maxId is a fold that crashed
    * before its marker and was then superseded by newer batches —
    * without this it leaks a full folded copy forever, since
    * [[tombstoneFolded]] walks only committed segments. Unmarked dirs
    * are invisible to readers, so the delete is safe at any point.
    */
  private[streaming] def dropStaleFolds(
      fs: FileSystem,
      tree: Path,
      maxId: Long): Unit =
    if (fs.exists(tree))
      fs.listStatus(tree).foreach { s =>
        if (s.isDirectory && s.getPath.getName.startsWith("batch=c") &&
          !SnapshotCommit.isCommitted(fs, s.getPath) &&
          segId(s.getPath).exists(_ < maxId))
          fs.delete(s.getPath, true)
      }

  /** Reclaim `_staging/<prefix><id>` dirs for ids other than `keep` —
    * the staging twin of [[dropStaleFolds]] (a crash between staging
    * write and publish leaves the whole staged fold on disk).
    */
  private[streaming] def dropStaleStaging(
      fs: FileSystem,
      stagingRoot: Path,
      prefix: String,
      keep: String): Unit =
    if (fs.exists(stagingRoot))
      fs.listStatus(stagingRoot).foreach { s =>
        val n = s.getPath.getName
        if (n.startsWith(prefix) && n != keep) fs.delete(s.getPath, true)
      }

  def compact(
      spark: SparkSession,
      indexPath: String,
      rebucket: DataFrame => DataFrame): Unit = {
    val root = new Path(indexPath)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val sigRoot = new Path(root, "sig")
    val bucketsRoot = new Path(root, "buckets")
    val sigSegs = committedSegs(fs, sigRoot)
    if (sigSegs.length <= 1) return // nothing to consolidate
    val maxId = sigSegs.flatMap(segId(_)).maxOption.getOrElse(return)
    val sigTarget = new Path(sigRoot, s"batch=c$maxId")
    val bucketsTarget = new Path(bucketsRoot, s"batch=c$maxId")
    // folded segments become marker-only TOMBSTONES (data files deleted,
    // commit marker kept), NOT deleted directories: the per-batch marker
    // is the ingest loop's replay-idempotence state. Deleting it would
    // let a crash-replayed batch re-ingest against a corpus that already
    // holds its own rows — and the near-dup probes' hot-bucket skip
    // guard (bn > maxBucketSize) means self-flagging is NOT guaranteed
    // to catch that, so the same id could commit twice. A tombstone is
    // one empty dir per batch (bounded by batch count); a replayed
    // folded batch sees its markers and no-ops, exactly as before.
    if (SnapshotCommit.isCommitted(fs, sigTarget) &&
      SnapshotCommit.isCommitted(fs, bucketsTarget)) {
      // this span is already folded — repair a crash mid-delete
      tombstoneFolded(fs, sigRoot, maxId)
      tombstoneFolded(fs, bucketsRoot, maxId)
      return
    }
    dropStaleFolds(fs, sigRoot, maxId)
    dropStaleFolds(fs, bucketsRoot, maxId)
    val stagingRoot = new Path(root, "_staging")
    dropStaleStaging(fs, stagingRoot, "compact-sig-", s"compact-sig-$maxId")
    dropStaleStaging(
      fs, stagingRoot, "compact-buckets-", s"compact-buckets-$maxId")
    // fold = every committed sig segment WITH data files (marker-only
    // empty-batch segments carry no rows); dedup by id so a replay
    // that sees both c<maxId> and a not-yet-deleted original is exact
    val dataSegs = sigSegs.filter(p =>
      fs.listStatus(p).exists(f =>
        f.isFile && !f.getPath.getName.startsWith("_")))
    if (dataSegs.isEmpty) return
    val sigStaging = new Path(root, s"_staging/compact-sig-$maxId")
    val bucketsStaging = new Path(root, s"_staging/compact-buckets-$maxId")
    fs.delete(sigStaging, true)
    fs.delete(bucketsStaging, true)
    spark.read
      .parquet(dataSegs.map(_.toString).toIndexedSeq: _*)
      .dropDuplicates("id")
      .write.mode("overwrite").parquet(sigStaging.toString)
    rebucket(spark.read.parquet(sigStaging.toString))
      .write.mode("overwrite").parquet(bucketsStaging.toString)
    SnapshotCommit.publish(fs, sigStaging, sigTarget)
    SnapshotCommit.publish(fs, bucketsStaging, bucketsTarget)
    tombstoneFolded(fs, sigRoot, maxId)
    tombstoneFolded(fs, bucketsRoot, maxId)
  }

  /** True iff a committed COMPACTED sig segment `batch=c<id>` with
    * id >= batchId exists under `indexRoot/sig` — proof that any
    * `sig/batch=<batchId>` committed before that fold was folded into
    * it ([[compact]] folds every committed sig segment with id <= maxId
    * and tombstones it; batch ids are monotone, so a later fold always
    * covers an earlier commit). A replaying batch that sees its own sig
    * marker plus a covering fold must NOT delete-and-re-ingest: its
    * rows already live in the compacted segment, and hot-bucket rows
    * (bn > maxBucketSize) escape the self-flag probe, so a re-ingest
    * could commit them a second time.
    */
  def foldedCovering(
      fs: org.apache.hadoop.fs.FileSystem,
      indexRoot: Path,
      batchId: Long): Boolean = {
    val sigRoot = new Path(indexRoot, "sig")
    fs.exists(sigRoot) && fs.listStatus(sigRoot).exists { s =>
      val n = s.getPath.getName
      s.isDirectory && n.startsWith("batch=c") && {
        val id = n.stripPrefix("batch=c")
        id.nonEmpty && id.forall(_.isDigit) && id.toLong >= batchId &&
          SnapshotCommit.isCommitted(fs, s.getPath)
      }
    }
  }

  /** True iff the segment tree holds at least one COMMITTED batch
    * directory WITH data files (a crashed partial publish is not
    * corpus; an all-survivors-dropped batch commits a marker-only
    * segment, which is state for idempotence but not readable corpus —
    * without the data-file condition an all-empty tree would fail
    * parquet schema inference on the probe's read).
    */
  def hasSegments(spark: SparkSession, path: String): Boolean = {
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.exists(p) && fs
      .listStatus(p)
      .exists(s =>
        s.isDirectory && s.getPath.getName.startsWith("batch=") &&
          SnapshotCommit.isCommitted(fs, s.getPath) &&
          fs.listStatus(s.getPath).exists(f =>
            f.isFile && !f.getPath.getName.startsWith("_")))
  }
}
