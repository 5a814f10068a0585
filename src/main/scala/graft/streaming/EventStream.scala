package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Structured Streaming over the events table (extension set — the
  * reference is batch-only, SURVEY §2.2 "Streaming").
  *
  * `events.ts` arrives as long nanoseconds (parquet TIMESTAMP(NANOS) via
  * nanosAsLong); [[withEventTime]] converts to a proper timestamp for
  * watermarking.
  *
  * The same tumbling-window aggregation is exposed twice:
  *  - [[bucketAggBatch]] — batch form, DuckDB-verifiable (10-minute epoch
  *    buckets as plain longs, engine-portable);
  *  - [[windowedCounts]] — streaming form with a watermark, run against
  *    `readStream` sources; covered by a memory-sink test.
  * Identical grouping logic in both proves the batch/stream parity that
  * makes backfill + live pipelines share one definition.
  */
object EventStream {

  /** nanos-long → TimestampType (micros precision). */
  def withEventTime(events: DataFrame): DataFrame =
    events.withColumn(
      "event_time",
      timestamp_micros((col("ts") / 1000L).cast("long")))

  /** 10-minute tumbling bucket as epoch seconds. Integral `div` on the
    * nanos long — Column./ would detour through double and lose nanosecond
    * precision at 1e18 magnitudes.
    */
  def bucketCol(tsNanosCol: String, bucketSec: Long = 600L): Column =
    expr(s"($tsNanosCol div ${bucketSec * 1000000000L}) * $bucketSec")

  /** Batch tumbling-window aggregation over epoch buckets. */
  def bucketAggBatch(events: DataFrame, bucketSec: Long = 600L): DataFrame =
    events
      .groupBy(
        bucketCol("ts", bucketSec).as("bucket"),
        col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        round(sum(col("value")), 4).as("sum_value"))

  /** Streaming tumbling-window aggregation with a 30-minute watermark —
    * late events beyond the watermark are dropped and state is bounded
    * (the property that lets this run forever on a real cluster).
    */
  def windowedCounts(stream: DataFrame, every: String = "10 minutes"): DataFrame =
    withEventTime(stream)
      .withWatermark("event_time", "30 minutes")
      .groupBy(window(col("event_time"), every), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
      .select(
        col("window.start").as("window_start"),
        col("event_type"),
        col("n"),
        col("sum_value"))

  /** Streaming exact dedup: first arrival per key wins. State is purged
    * by the watermark (`dropDuplicatesWithinWatermark`), so it stays
    * bounded on an infinite stream — duplicates separated by more than
    * the watermark horizon can re-emit, the standard streaming trade.
    * Exact global dedup is the batch operator ([[graft.operators.Dedup]]).
    */
  def dedupStream(
      stream: DataFrame,
      keys: Seq[String],
      watermark: String = "30 minutes"): DataFrame =
    withEventTime(stream)
      .withWatermark("event_time", watermark)
      .dropDuplicatesWithinWatermark(keys)

  /** Stream-static enrichment join: each micro-batch of the event stream
    * joins a STATIC dimension frame (user profile, customer table). Spark
    * plans the static side per micro-batch like any batch join — a small
    * dimension broadcasts, so the streaming side never shuffles, which is
    * the only join shape a high-rate stream tolerates. No watermark
    * needed (the static side never grows stale state).
    */
  def enrichStream(
      stream: DataFrame,
      dim: DataFrame,
      keys: Seq[String]): DataFrame =
    stream.join(broadcast(dim), keys)

  /** Read the events parquet as a stream. The file source wants a
    * directory, so stream the sf directory with a glob pinned to the
    * events file.
    */
  def readEventsStream(spark: SparkSession, sfDir: String): DataFrame = {
    val schema = spark.read.parquet(s"$sfDir/events.parquet").schema
    spark.readStream
      .schema(schema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(sfDir)
  }
}
