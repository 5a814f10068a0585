package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Structured Streaming over the events table (extension set — the
  * reference is batch-only, SURVEY §2.2 "Streaming").
  *
  * `events.ts` arrives as long nanoseconds — [[graft.Tables.normalizeEventTs]]
  * owns the parquet physical-type seam (timestamp[us] fixtures are rewritten
  * to epoch-nanos longs at the source); [[withEventTime]] converts back to a
  * proper timestamp for watermarking.
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

  /** nanos-long → TimestampType (micros precision). Integral `div`, not
    * Column./ — the double detour rounds a ~1.7e18 nanos value to a
    * multiple of 256 BEFORE dividing (2⁵³ mantissa), shifting boundary
    * rows by ±256 ns (same rationale as [[bucketCol]]).
    */
  def withEventTime(events: DataFrame): DataFrame =
    events.withColumn("event_time", timestamp_micros(expr("ts div 1000")))

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

  /** STREAM-STREAM interval join (click→purchase attribution): match
    * each purchase to the same user's clicks in the preceding
    * `windowMin` minutes. Works unchanged on two streaming frames or two
    * batch frames — the parity that lets backfill and live attribution
    * share one definition (the [[windowedCounts]] principle).
    *
    * On streams BOTH sides carry a watermark and the join condition
    * bounds purchase_time to [click_time, click_time + windowMin], so
    * Spark can expire join state: a click older than
    * watermark + windowMin can never match a future purchase and is
    * dropped from the state store. Without the time bound the state
    * grows forever — the condition is not an optimization, it is what
    * makes an infinite stream-stream join runnable at all. State is
    * hash-partitioned on user_id: the same one-exchange-per-side shape
    * as the batch join at any cluster size.
    */
  /** @param joinType `inner` (matched pairs only) or `leftOuter` —
    *   the conversion-funnel shape: EVERY click emits, unconverted ones
    *   with a null purchase once the watermark proves no purchase can
    *   still arrive inside the window (Spark holds the left row in
    *   state until event-time passes click_time + window + watermark,
    *   then emits the null match — outer results are late by exactly
    *   the watermark, the documented trade).
    */
  def attributionJoin(
      clicks: DataFrame,
      purchases: DataFrame,
      windowMin: Int = 30,
      watermark: String = "1 hour",
      joinType: String = "inner"): DataFrame = {
    def side(df: DataFrame) = {
      val t = withEventTime(df)
      if (t.isStreaming) t.withWatermark("event_time", watermark) else t
    }
    val c = side(clicks).select(
      col("user_id").as("c_user"),
      col("event_id").as("click_id"),
      col("event_time").as("click_time"))
    val p = side(purchases).select(
      col("user_id").as("p_user"),
      col("event_id").as("purchase_id"),
      col("event_time").as("purchase_time"))
    c.join(
        p,
        expr(s"""c_user = p_user
                 AND purchase_time >= click_time
                 AND purchase_time <= click_time + interval $windowMin minutes"""),
        joinType)
      .select(
        col("c_user").as("user_id"),
        col("click_id"),
        col("purchase_id"))
  }

  /** Read the events parquet as a stream. The file source wants a
    * directory, so stream the sf directory with a glob pinned to the
    * events file.
    */
  def readEventsStream(spark: SparkSession, sfDir: String): DataFrame = {
    val schema = spark.read.parquet(s"$sfDir/events.parquet").schema
    graft.Tables.normalizeEventTs(
      spark.readStream
        .schema(schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sfDir))
  }
}
