package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.StreamingQuery

import graft.multimodal.Multimodal

/** Streaming perceptual IMAGE ingestion: each micro-batch of raw
  * encoded images is dHash-fingerprinted
  * ([[Multimodal.dHashImages]] — undecodable rows quarantine, i.e.
  * never enter the corpus) and fed through the signature-agnostic
  * banded-Hamming ingest ([[Sig64Ingest]]), so today's crawl dedups
  * its images against the whole ingested corpus WITHOUT re-hashing
  * it — the persisted index carries the 8-byte signatures and the
  * probe verifies inline in the bucket join. Defaults match the batch
  * image path (`q207`: maxHamming 3, 4 bands of width 16 — pigeonhole
  * recall complete for d ≤ 3).
  *
  * Commit protocol, replay idempotence, compaction, and survivor
  * semantics: [[Sig64Ingest]] (the [[NearDupIngest]] contract).
  */
object ImageIngest {

  /** One micro-batch step over raw image rows (`idCol`,
    * `dataCol`: encoded image bytes). Idempotent per
    * (indexPath, batchId).
    */
  def ingestBatch(
      batch: DataFrame,
      indexPath: String,
      dataCol: String,
      idCol: String,
      batchId: Long,
      maxHamming: Int = 3,
      bands: Int = 4,
      maxBucketSize: Int = 256,
      sourceTag: String = ""): Unit =
    Sig64Ingest.ingestBatch(
      Multimodal.dHashImages(
        batch.select(col(idCol).as("id"), col(dataCol).as("data"))),
      indexPath, "sig", "id", batchId, bands, maxHamming, maxBucketSize,
      sourceTag)

  /** [[Sig64Ingest.compact]] on the image index. */
  def compact(
      spark: org.apache.spark.sql.SparkSession,
      indexPath: String): Unit = Sig64Ingest.compact(spark, indexPath)

  /** The ingested (surviving) image ids, or None before the first
    * commit.
    */
  def ingestedIds(
      spark: org.apache.spark.sql.SparkSession,
      indexPath: String): Option[DataFrame] =
    Sig64Ingest.ingestedIds(spark, indexPath)

  /** Run the ingestion loop over an image stream. */
  def start(
      stream: DataFrame,
      indexPath: String,
      checkpointDir: String,
      dataCol: String = "data",
      idCol: String = "id",
      maxHamming: Int = 3,
      bands: Int = 4,
      maxBucketSize: Int = 256,
      sourceTag: String = ""): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        ingestBatch(
          batch, indexPath, dataCol, idCol, batchId, maxHamming, bands,
          maxBucketSize, sourceTag)
      }
      .start()
}

/** Streaming perceptual AUDIO ingestion — [[ImageIngest]] with the
  * spectral-band fingerprint ([[Multimodal.audioFingerprints]],
  * Haitsma–Kalker-style) and the audio Hamming budget (`q211`:
  * maxHamming 5, 8 bands of width 8). Completes the streaming dedup
  * triad: text ([[NearDupIngest]]), image ([[ImageIngest]]), audio.
  */
object AudioIngest {

  /** One micro-batch step over raw audio rows (`idCol`, `dataCol`:
    * encoded clip bytes — WAV/AIFF/AU, any PCM/ULAW/ALAW encoding).
    * Idempotent per (indexPath, batchId).
    */
  def ingestBatch(
      batch: DataFrame,
      indexPath: String,
      dataCol: String,
      idCol: String,
      batchId: Long,
      maxHamming: Int = 5,
      bands: Int = 8,
      maxBucketSize: Int = 256,
      sourceTag: String = ""): Unit =
    Sig64Ingest.ingestBatch(
      Multimodal.audioFingerprints(
        batch.select(col(idCol).as("id"), col(dataCol).as("data"))),
      indexPath, "sig", "id", batchId, bands, maxHamming, maxBucketSize,
      sourceTag)

  /** [[Sig64Ingest.compact]] on the audio index. */
  def compact(
      spark: org.apache.spark.sql.SparkSession,
      indexPath: String): Unit = Sig64Ingest.compact(spark, indexPath)

  /** The ingested (surviving) clip ids, or None before the first
    * commit.
    */
  def ingestedIds(
      spark: org.apache.spark.sql.SparkSession,
      indexPath: String): Option[DataFrame] =
    Sig64Ingest.ingestedIds(spark, indexPath)
}

/** Streaming perceptual VIDEO ingestion — [[ImageIngest]] with the
  * frame-sampled majority-vote clip fingerprint
  * ([[Multimodal.videoFingerprints]]: dHash of sampled DIB frames,
  * per-bit majority — codec-blind across the pure-JDK seam's raw-AVI
  * and MJPEG decoders) and the video Hamming budget (`q215`:
  * maxHamming 4, 8 bands of width 8). Completes the streaming dedup
  * modality QUARTET: text ([[NearDupIngest]]), image ([[ImageIngest]]),
  * audio ([[AudioIngest]]), video.
  */
object VideoIngest {

  /** One micro-batch step over raw video rows (`idCol`, `dataCol`:
    * encoded clip bytes — raw RIFF/AVI or MJPEG-AVI; an external codec
    * plugs in via `decoder`). Idempotent per (indexPath, batchId).
    */
  def ingestBatch(
      batch: DataFrame,
      indexPath: String,
      dataCol: String,
      idCol: String,
      batchId: Long,
      maxHamming: Int = 4,
      bands: Int = 8,
      maxBucketSize: Int = 256,
      sourceTag: String = "",
      decoder: Multimodal.VideoDecoder = Multimodal.anyAviDecoder): Unit =
    Sig64Ingest.ingestBatch(
      Multimodal.videoFingerprints(
        batch.select(col(idCol).as("id"), col(dataCol).as("data")),
        decoder),
      indexPath, "sig", "id", batchId, bands, maxHamming, maxBucketSize,
      sourceTag)

  /** [[Sig64Ingest.compact]] on the video index. */
  def compact(
      spark: org.apache.spark.sql.SparkSession,
      indexPath: String): Unit = Sig64Ingest.compact(spark, indexPath)

  /** The ingested (surviving) clip ids, or None before the first
    * commit.
    */
  def ingestedIds(
      spark: org.apache.spark.sql.SparkSession,
      indexPath: String): Option[DataFrame] =
    Sig64Ingest.ingestedIds(spark, indexPath)

  /** Run the ingestion loop over a video stream. */
  def start(
      stream: DataFrame,
      indexPath: String,
      checkpointDir: String,
      dataCol: String = "data",
      idCol: String = "id",
      maxHamming: Int = 4,
      bands: Int = 8,
      maxBucketSize: Int = 256,
      sourceTag: String = ""): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        ingestBatch(
          batch, indexPath, dataCol, idCol, batchId, maxHamming, bands,
          maxBucketSize, sourceTag)
      }
      .start()
}
