package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.functions.TextFunctions

/** Streaming INGESTION dedup — the continuous form of
  * [[graft.operators.Dedup.incrementalNew]]: each micro-batch is
  * fingerprinted, deduped within itself (min id per fingerprint, so the
  * result is batching-invariant), anti-joined against the PERSISTED
  * fingerprint table, and the survivors are appended to that table.
  *
  * State lives in a parquet table, not executor memory: history can be
  * 100 TB while each micro-batch shuffles only its own fingerprints —
  * the standard "dedup against the lake" ingestion loop. Exactly-once
  * per batch comes from the streaming checkpoint (a replayed batch
  * re-anti-joins and re-appends only what is still unseen... a replay
  * after a partial append can duplicate state rows, which is harmless
  * here: the anti-join only asks set membership. A transactional table
  * format would make the append atomic; plain parquet is the
  * no-extra-dependency version of the same loop).
  */
object IngestDedup {

  /** One micro-batch step (also usable directly for batch backfill). */
  def ingestBatch(
      batch: DataFrame,
      statePath: String,
      textCol: String,
      idCol: String): Unit = {
    val spark = batch.sparkSession
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
    fresh.select("fp", "id").write.mode("append").parquet(statePath)
  }

  /** The persisted fingerprint set, or None before the first append. */
  def seenFingerprints(
      spark: SparkSession,
      statePath: String): Option[DataFrame] =
    try Some(spark.read.parquet(statePath))
    catch { case _: org.apache.spark.sql.AnalysisException => None }

  /** Run the ingestion loop over a document stream. */
  def start(
      stream: DataFrame,
      statePath: String,
      checkpointDir: String,
      textCol: String = "text",
      idCol: String = "doc_id"): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        ingestBatch(batch, statePath, textCol, idCol)
      }
      .start()
}
