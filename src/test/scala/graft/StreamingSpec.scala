package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.EventStream

/** Batch/stream parity: the streaming windowed aggregation over the
  * events file source must agree with the batch bucket aggregation.
  */
class StreamingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("streaming windowed counts match batch buckets (memory sink)") {
    val batch = EventStream
      .bucketAggBatch(Tables.events(spark, TestSpark.sf))
      .agg(sum("n"))
      .head()
      .getLong(0)

    val stream = EventStream.readEventsStream(spark, TestSpark.sf)
    val q = EventStream
      .windowedCounts(stream)
      .writeStream
      .outputMode("complete")
      .format("memory")
      .queryName("graft_stream_test")
      .start()
    try {
      q.processAllAvailable()
      val streamed = spark
        .sql("SELECT sum(n) FROM graft_stream_test")
        .head()
        .getLong(0)
      assert(streamed === batch)
      assert(batch === Tables.events(spark, TestSpark.sf).count())
    } finally q.stop()
  }
}
