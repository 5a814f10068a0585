package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.MatView

/** The streamed materialized view must equal the batch aggregate of
  * everything ingested, under any batching, and replay must not
  * double-count.
  */
class MatViewSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def viewOf(path: String): Map[Long, (Long, Long, Long, Long)] =
    MatView
      .currentView(spark, path)
      .get
      .as[(Long, Long, Long, Long, Long)]
      .collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5)))
      .toMap

  test("streamed view equals the batch aggregate, any batching") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val path = Files.createTempDirectory("graft-mv").toString + "/view"
    val ckpt = Files.createTempDirectory("graft-mv-ckpt").toString

    val all = Seq(
      (1L, 10L), (1L, 20L), (2L, 5L), // batch 0
      (1L, 30L), (3L, 7L), (2L, -5L)) // batch 1
    val input = MemoryStream[(Long, Long)]
    val q = MatView.start(
      input.toDS().toDF("k", "cents"), path, ckpt, Seq("k"), "cents")
    try {
      input.addData(all.take(3): _*)
      q.processAllAvailable()
      input.addData(all.drop(3): _*)
      q.processAllAvailable()
    } finally q.stop()

    val expected = MatView
      .aggregateOf(all.toDF("k", "cents"), Seq("k"), $"cents")
      .as[(Long, Long, Long, Long, Long)]
      .collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5)))
      .toMap
    assert(viewOf(path) === expected)
    assert(viewOf(path)(1L) === ((3L, 60L, 10L, 30L)))
  }

  test("replaying a committed batch id does not double-count") {
    val path = Files.createTempDirectory("graft-mv2").toString + "/view"
    val b0 = Seq((1L, 10L), (2L, 5L)).toDF("k", "cents")
    MatView.applyBatch(b0, path, Seq("k"), "cents", 0L)
    MatView.applyBatch(b0, path, Seq("k"), "cents", 0L) // replay: no-op
    assert(viewOf(path) === Map(
      1L -> ((1L, 10L, 10L, 10L)),
      2L -> ((1L, 5L, 5L, 5L))))
    MatView.applyBatch(
      Seq((1L, 2L)).toDF("k", "cents"), path, Seq("k"), "cents", 1L)
    assert(viewOf(path)(1L) === ((2L, 12L, 2L, 10L)))
  }
}
