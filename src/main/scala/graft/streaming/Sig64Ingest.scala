package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.Dedup

/** Streaming near-dup ingestion over ANY 64-bit perceptual signature —
  * the signature-agnostic core [[ImageIngest]] (dHash) and
  * [[AudioIngest]] (spectral fingerprint) are thin wrappers over, and
  * the [[NearDupIngest]] / [[EmbedIngest]] pattern completed for the
  * banded-Hamming index family ([[Dedup.sig64IngestSegmentFrames]]):
  * each micro-batch of (id, sig) rows is near-dup-deduped WITHIN
  * itself, then AGAINST the already-ingested corpus via the persisted
  * banded index (probe verifies Hamming INLINE in the bucket join —
  * the buckets tree carries the signatures), and the survivors commit
  * as the batch's index segment. The index IS the corpus registry.
  *
  * COMMIT PROTOCOL: identical to [[NearDupIngest]] — per batch,
  * `sig/batch=<id>` and `buckets/batch=<id>` publish via
  * [[SnapshotCommit]] (staged write → rename → marker); a batch is
  * committed iff BOTH markers exist; replay of a committed id is a
  * no-op; a partial publish is deleted and rebuilt; compaction
  * tombstones survive replay ([[SegmentCompaction.foldedCovering]]).
  * Survivor-choice semantics (earlier batches win; within a batch the
  * component's min id) are the [[NearDupIngest]] contract verbatim.
  */
object Sig64Ingest {

  /** One micro-batch step over a signed frame holding `idCol` and
    * `sigCol` (a 64-bit signature). Idempotent per (indexPath,
    * batchId). The first batch fixes (bands, maxHamming) in the index
    * `_meta`; later batches must present the same ones.
    */
  def ingestBatch(
      sigBatch: DataFrame,
      indexPath: String,
      sigCol: String,
      idCol: String,
      batchId: Long,
      bands: Int = 8,
      maxHamming: Int = 5,
      maxBucketSize: Int = 256,
      sourceTag: String = ""): Unit = {
    val spark = sigBatch.sparkSession
    val root = new Path(indexPath)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    Dedup.sig64EnsureMeta(spark, indexPath, bands, maxHamming, sourceTag)
    val sigTarget = new Path(root, s"sig/batch=$batchId")
    val bucketsTarget = new Path(root, s"buckets/batch=$batchId")
    if (SnapshotCommit.isCommitted(fs, sigTarget) &&
      SnapshotCommit.isCommitted(fs, bucketsTarget)) return
    // crash between the two publishes then compact() before the
    // replay: treat a folded-away sig segment as already ingested
    // (the NearDupIngest rationale, verbatim)
    if (SnapshotCommit.isCommitted(fs, sigTarget) &&
      SegmentCompaction.foldedCovering(fs, root, batchId)) {
      fs.delete(bucketsTarget, true)
      return
    }
    // a partial publish is a crashed attempt — delete BEFORE the
    // probe, or the retry flags this batch's docs against themselves
    fs.delete(sigTarget, true)
    fs.delete(bucketsTarget, true)

    IngestTuning.withBatchTuning(spark) {
      val (sig, buckets) = Dedup.sig64IngestSegmentFrames(
        sigBatch.select(col(idCol).as("id"), col(sigCol).as("sig")),
        indexPath,
        maxBucketSize,
        probeCorpus = SegmentCompaction.hasSegments(spark, s"$indexPath/buckets"),
        sourceTag = sourceTag)
      val sigStaging = new Path(root, s"_staging/sig-$batchId")
      val bucketsStaging = new Path(root, s"_staging/buckets-$batchId")
      fs.delete(sigStaging, true)
      fs.delete(bucketsStaging, true)
      // concurrent staging writes; ordered publishes — crash protocol
      // unchanged (see NearDupIngest.ingestBatch)
      IngestTuning.parallelWrites(
        () => IngestTuning.writeSegment(sig, sigStaging.toString),
        () =>
          IngestTuning.writeSegment(buckets, bucketsStaging.toString))
      SnapshotCommit.publish(fs, sigStaging, sigTarget)
      SnapshotCommit.publish(fs, bucketsStaging, bucketsTarget)
      // roll the probe's versioned frame cache forward — the next
      // batch's probe reads NO delta segments from disk
      Dedup.extendIndexCache(spark, s"$indexPath/sig", s"batch=$batchId", sig)
      Dedup.extendIndexCache(
        spark, s"$indexPath/buckets", s"batch=$batchId", buckets)
    }
  }

  /** Consolidate committed segments into one `batch=c<maxId>` per tree,
    * recomputing corpus-global bucket sizes from the stored signatures
    * ([[Dedup.sig64Rebucket]] — banding is a pure function of the
    * persisted long; no decode, no re-fingerprinting). Mechanics and
    * crash protocol: [[SegmentCompaction.compact]].
    */
  def compact(
      spark: org.apache.spark.sql.SparkSession,
      indexPath: String): Unit =
    SegmentCompaction.compact(
      spark, indexPath, Dedup.sig64Rebucket(_, indexPath))

  /** The ingested (surviving) ids, or None before the first commit. */
  def ingestedIds(
      spark: org.apache.spark.sql.SparkSession,
      indexPath: String): Option[DataFrame] =
    if (!SegmentCompaction.hasSegments(spark, s"$indexPath/sig")) None
    else Some(spark.read.parquet(s"$indexPath/sig").select("id"))

  /** Run the ingestion loop over a pre-signed stream — checkpointed
    * batch ids + marker commits = exactly-once index state under
    * replay.
    */
  def start(
      stream: DataFrame,
      indexPath: String,
      checkpointDir: String,
      sigCol: String = "sig",
      idCol: String = "id",
      bands: Int = 8,
      maxHamming: Int = 5,
      maxBucketSize: Int = 256,
      sourceTag: String = ""): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        ingestBatch(
          batch, indexPath, sigCol, idCol, batchId, bands, maxHamming,
          maxBucketSize, sourceTag)
      }
      .start()
}
