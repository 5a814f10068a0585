package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.Dedup

/** Streaming NEAR-DUP ingestion — the MinHash analog of [[IngestDedup]]
  * (which dedupes on exact normalized fingerprints): each micro-batch
  * is near-dup-deduped WITHIN itself (pairs → connected components →
  * one survivor per component, [[Dedup.resolveComponents]]), then
  * AGAINST the already-ingested corpus via the persisted MinHash index
  * ([[Dedup.dedupIncoming]] — the index is only ever scanned, the
  * batch broadcasts), and the survivors' signatures + buckets are
  * committed as the batch's index segment. The index IS the corpus
  * registry: ids present in `sig/` are exactly the docs that survived
  * ingestion.
  *
  * COMMIT PROTOCOL: per batch, `sig/batch=<id>` and
  * `buckets/batch=<id>` publish via [[SnapshotCommit]] (staged write →
  * rename → marker). A batch is committed iff BOTH markers exist;
  * replay of a committed id is a no-op, a partial publish (crash
  * between the two) is deleted and rebuilt — each batch's rows land in
  * the index exactly once under any crash + replay interleaving. The
  * `batch=<id>` layout is hive-partitioned, so "corpus as of batch N"
  * is a partition filter, and segments compact like [[IngestDedup]]'s.
  *
  * Semantics, stated honestly: WHICH member of a near-dup cluster
  * survives depends on arrival order (earlier batches win; within a
  * batch, the component's min id) — the no-near-dup-of-an-earlier-doc
  * invariant is batching-independent, the survivor CHOICE is not.
  * That is the semantics every streaming dedup has; a batch rerun of
  * [[graft.SparkEntry]] q166 over the final corpus is the
  * order-independent check.
  */
object NearDupIngest {

  /** One micro-batch step (also usable directly for batch backfill).
    * Idempotent per (indexPath, batchId).
    */
  def ingestBatch(
      batch: DataFrame,
      indexPath: String,
      textCol: String,
      idCol: String,
      batchId: Long,
      shingleLen: Int = 4,
      numHashes: Int = 32,
      bands: Int = 8,
      threshold: Double = 0.4,
      maxBucketSize: Int = 256,
      sourceTag: String = ""): Unit = {
    val spark = batch.sparkSession
    val root = new Path(indexPath)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    Dedup.minHashEnsureMeta(
      spark, indexPath, shingleLen, numHashes, bands, sourceTag)
    val sigTarget = new Path(root, s"sig/batch=$batchId")
    val bucketsTarget = new Path(root, s"buckets/batch=$batchId")
    if (SnapshotCommit.isCommitted(fs, sigTarget) &&
      SnapshotCommit.isCommitted(fs, bucketsTarget)) return
    // a partial publish (one target, or unmarked targets) is a crashed
    // attempt. Delete it BEFORE step 2's probe, not just before the
    // re-publish: the probe reads the segment tree by path, and a
    // half-committed segment of THIS batch would make the retry flag
    // the batch's own docs as near-dups of themselves and drop them.
    fs.delete(sigTarget, true)
    fs.delete(bucketsTarget, true)

    // 1. intra-batch: pairs → components → one survivor per component
    val intra = Dedup.dedupByComponents(
      batch,
      idCol,
      Dedup.resolveComponents(
        Dedup.minHashNearDup(
          batch, textCol, idCol, shingleLen, numHashes, bands, threshold,
          maxBucketSize)))
    // 2. against the already-ingested corpus (no segments yet → all
    // survive; the read throws on a segment-less tree, same contract
    // as IngestDedup.seenFingerprints)
    val survivors =
      if (hasSegments(spark, s"$indexPath/buckets"))
        Dedup.dedupIncoming(
          intra, textCol, idCol, indexPath, threshold, maxBucketSize,
          sourceTag)
      else intra
    // 3. commit the survivors' signatures + buckets as this batch's
    // index segment
    val (sig, buckets) = Dedup.minHashSegmentFrames(
      survivors, textCol, idCol, indexPath, sourceTag)
    val sigStaging = new Path(root, s"_staging/sig-$batchId")
    val bucketsStaging = new Path(root, s"_staging/buckets-$batchId")
    fs.delete(sigStaging, true)
    fs.delete(bucketsStaging, true)
    sig.write.mode("overwrite").parquet(sigStaging.toString)
    buckets.write.mode("overwrite").parquet(bucketsStaging.toString)
    SnapshotCommit.publish(fs, sigStaging, sigTarget)
    SnapshotCommit.publish(fs, bucketsStaging, bucketsTarget)
  }

  /** True iff the segment tree holds at least one COMMITTED batch
    * directory WITH data files (a crashed partial publish is not
    * corpus; an all-survivors-dropped batch commits a marker-only
    * segment, which is state for idempotence but not readable corpus —
    * without the data-file condition an all-empty tree would fail
    * parquet schema inference on the probe's read).
    */
  private def hasSegments(
      spark: org.apache.spark.sql.SparkSession,
      path: String): Boolean = {
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

  /** The ingested (surviving) doc ids, or None before the first commit. */
  def ingestedIds(
      spark: org.apache.spark.sql.SparkSession,
      indexPath: String): Option[DataFrame] =
    if (!hasSegments(spark, s"$indexPath/sig")) None
    else Some(spark.read.parquet(s"$indexPath/sig").select("id"))

  /** Consolidate committed `batch=<id>` segments into one `batch=c<maxId>`
    * segment per tree ([[IngestDedup.compact]]'s shape, applied to BOTH
    * trees under one fold), recomputing CORPUS-GLOBAL bucket sizes from
    * the stored signatures as it goes ([[Dedup.minHashRebucket]] — no
    * text, no re-shingling; banding is a pure function of the persisted
    * `mh` column). That recount is the semantic payoff, not just
    * housekeeping: per-batch segments carry batch-LOCAL `bn`, so the
    * probe's `maxBucketSize` skip-guard undercounts a hot bucket spread
    * across many batches; after compaction `bn` is exact over the
    * folded span.
    *
    * Crash-safe, replayable at any point: signatures publish before
    * buckets (marker protocol), the fold set is deduplicated by id so a
    * replay that reads both a committed `c<maxId>` and a not-yet-deleted
    * folded original counts each doc once, and a crash mid-delete is
    * repaired on the next call (both targets committed → finish
    * dropping folded ids ≤ maxId). A probe racing a crashed half-fold
    * may see a doc's buckets twice — harmless: a duplicate near-dup
    * flag row still anti-joins to the same decision.
    */
  def compact(
      spark: org.apache.spark.sql.SparkSession,
      indexPath: String): Unit = {
    val root = new Path(indexPath)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val sigRoot = new Path(root, "sig")
    val bucketsRoot = new Path(root, "buckets")
    def committedSegs(tree: Path): Array[Path] =
      if (!fs.exists(tree)) Array.empty
      else
        fs.listStatus(tree)
          .filter(s =>
            s.isDirectory && s.getPath.getName.startsWith("batch=") &&
              SnapshotCommit.isCommitted(fs, s.getPath))
          .map(_.getPath)
    def segId(p: Path): Option[Long] = {
      val n = p.getName.stripPrefix("batch=").stripPrefix("c")
      if (n.nonEmpty && n.forall(_.isDigit)) Some(n.toLong) else None
    }
    val sigSegs = committedSegs(sigRoot)
    if (sigSegs.length <= 1) return // nothing to consolidate
    val maxId = sigSegs.flatMap(segId(_)).maxOption.getOrElse(return)
    val sigTarget = new Path(sigRoot, s"batch=c$maxId")
    val bucketsTarget = new Path(bucketsRoot, s"batch=c$maxId")
    def dropFolded(tree: Path): Unit =
      committedSegs(tree).foreach { p =>
        if (p.getName != s"batch=c$maxId" && segId(p).exists(_ <= maxId))
          fs.delete(p, true)
      }
    if (SnapshotCommit.isCommitted(fs, sigTarget) &&
      SnapshotCommit.isCommitted(fs, bucketsTarget)) {
      // this span is already folded — repair a crash mid-delete
      dropFolded(sigRoot); dropFolded(bucketsRoot)
      return
    }
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
    Dedup
      .minHashRebucket(spark.read.parquet(sigStaging.toString), indexPath)
      .write.mode("overwrite").parquet(bucketsStaging.toString)
    SnapshotCommit.publish(fs, sigStaging, sigTarget)
    SnapshotCommit.publish(fs, bucketsStaging, bucketsTarget)
    dropFolded(sigRoot); dropFolded(bucketsRoot)
  }

  /** Run the ingestion loop over a document stream — checkpointed batch
    * ids + marker commits = exactly-once index state under replay.
    */
  def start(
      stream: DataFrame,
      indexPath: String,
      checkpointDir: String,
      textCol: String = "text",
      idCol: String = "doc_id",
      shingleLen: Int = 4,
      numHashes: Int = 32,
      bands: Int = 8,
      threshold: Double = 0.4): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        ingestBatch(
          batch, indexPath, textCol, idCol, batchId, shingleLen,
          numHashes, bands, threshold)
      }
      .start()
}
