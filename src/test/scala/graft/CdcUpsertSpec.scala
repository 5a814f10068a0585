package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.CdcUpsert

/** Continuous MERGE: the streamed snapshot must equal the batch merges
  * applied in order, replay of a committed batch must be a no-op, a
  * crashed staging attempt must never surface as state, and retention
  * pruning keeps time travel bounded.
  */
class CdcUpsertSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def snapshot(path: String): Set[(Long, String, Double)] =
    CdcUpsert
      .currentSnapshot(spark, path)
      .get
      .as[(Long, String, Double)]
      .collect()
      .toSet

  test("streamed snapshot equals the ordered batch merges") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val snapPath = Files.createTempDirectory("graft-cdc").toString + "/snap"
    val ckpt = Files.createTempDirectory("graft-cdc-ckpt").toString

    val input = MemoryStream[(Long, String, Double, Long, Boolean)]
    val q = CdcUpsert.start(
      input.toDS().toDF("k", "tag", "v", "version", "deleted"),
      snapPath,
      ckpt,
      keys = Seq("k"))
    try {
      // batch 0: three inserts
      input.addData((1L, "a", 10.0, 1L, false), (2L, "b", 20.0, 1L, false),
        (3L, "c", 30.0, 1L, false))
      q.processAllAvailable()
      assert(snapshot(snapPath) ===
        Set((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0)))
      // batch 1: k=1 updated twice (latest version wins), k=2 deleted,
      // k=9 inserted
      input.addData((1L, "a", 11.0, 2L, false), (1L, "a", 12.0, 3L, false),
        (2L, "b", 0.0, 2L, true), (9L, "z", 90.0, 2L, false))
      q.processAllAvailable()
      assert(snapshot(snapPath) ===
        Set((1L, "a", 12.0), (3L, "c", 30.0), (9L, "z", 90.0)))
    } finally q.stop()
  }

  test("replay is a no-op; crashed staging never surfaces; prune retains") {
    val snapPath = Files.createTempDirectory("graft-cdc2").toString + "/snap"
    def changes(rows: (Long, String, Double, Long, Boolean)*) =
      rows.toDF("k", "tag", "v", "version", "deleted")

    CdcUpsert.applyBatch(
      changes((1L, "a", 10.0, 1L, false), (2L, "b", 20.0, 1L, false)),
      snapPath, Seq("k"), "version", "deleted", batchId = 0L)

    // simulate a crash mid-batch-1: staging garbage on disk must be
    // invisible to readers and cleared by the retry
    Seq((99L, "junk", 0.0)).toDF("k", "tag", "v")
      .write.parquet(snapPath + "/_staging/snap-1")
    assert(snapshot(snapPath) === Set((1L, "a", 10.0), (2L, "b", 20.0)))

    val b1 = changes((1L, "a", 11.0, 2L, false))
    CdcUpsert.applyBatch(b1, snapPath, Seq("k"), "version", "deleted", 1L)
    assert(snapshot(snapPath) === Set((1L, "a", 11.0), (2L, "b", 20.0)))

    // replaying the committed id with DIFFERENT (stale) data: no-op
    CdcUpsert.applyBatch(
      changes((1L, "a", 99.0, 9L, false)),
      snapPath, Seq("k"), "version", "deleted", 1L)
    assert(snapshot(snapPath) === Set((1L, "a", 11.0), (2L, "b", 20.0)))

    // time travel both versions, then prune to the latest only
    assert(
      spark.read.parquet(s"$snapPath/snap=0").count() === 2 &&
        spark.read.parquet(s"$snapPath/snap=1").count() === 2)
    CdcUpsert.prune(spark, snapPath, keep = 1)
    val fs = new org.apache.hadoop.fs.Path(snapPath).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$snapPath/snap=0")))
    assert(snapshot(snapPath) === Set((1L, "a", 11.0), (2L, "b", 20.0)))
  }
}
