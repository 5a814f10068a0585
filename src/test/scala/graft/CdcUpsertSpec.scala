package graft

import java.nio.file.Files

import org.apache.spark.sql.functions.{col, lit}
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

  // ---- log-structured twin (CdcLog) ----

  private def logState(path: String): Set[(Long, String, Double)] =
    graft.streaming.CdcLog
      .read(spark, path, keys = Seq("k"))
      .get
      .as[(Long, String, Double)]
      .collect()
      .toSet

  private def changes(rows: (Long, String, Double, Long, Boolean)*) =
    rows.toDF("k", "tag", "v", "version", "deleted")

  test("log-structured CDC equals snapshot mode on the same batch sequence") {
    import graft.streaming.CdcLog
    val snapPath = Files.createTempDirectory("graft-cdc-s").toString + "/snap"
    val logPath = Files.createTempDirectory("graft-cdc-l").toString + "/log"

    // batch 0: inserts, one key updated twice in-batch (version wins);
    // batch 1: delete + a LOWER-version change to k=1 — sequential
    // merge semantics say the later BATCH wins regardless of version;
    // batch 2: re-insert of the deleted key
    val batches = Seq(
      changes((1L, "a", 10.0, 9L, false), (1L, "a", 10.5, 8L, false),
        (2L, "b", 20.0, 1L, false), (3L, "c", 30.0, 1L, false)),
      changes((1L, "a", 11.0, 2L, false), (2L, "b", 0.0, 2L, true)),
      changes((2L, "b", 22.0, 1L, false)))
    batches.zipWithIndex.foreach { case (b, i) =>
      CdcUpsert.applyBatch(
        b, snapPath, Seq("k"), "version", "deleted", i.toLong)
      CdcLog.appendBatch(
        b, logPath, Seq("k"), "version", "deleted", i.toLong)
    }
    val expected = snapshot(snapPath)
    assert(expected ===
      Set((1L, "a", 11.0), (2L, "b", 22.0), (3L, "c", 30.0)))
    assert(logState(logPath) === expected)

    // write amplification is O(batch), not O(table): batch 2's segment
    // holds exactly its 1 change row, while snapshot mode's snap=2 is
    // the whole 3-row table
    assert(
      spark.read.parquet(s"$logPath/delta/batch=2").count() === 1L)
    assert(spark.read.parquet(s"$snapPath/snap=2").count() === 3L)
  }

  test("log CDC: replay no-op, crashed staging invisible, compaction folds") {
    import graft.streaming.CdcLog
    import org.apache.hadoop.fs.{FileUtil, Path}
    val logPath = Files.createTempDirectory("graft-cdc-l2").toString + "/log"
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = new Path(logPath).getFileSystem(conf)

    CdcLog.appendBatch(
      changes((1L, "a", 10.0, 1L, false), (2L, "b", 20.0, 1L, false)),
      logPath, Seq("k"), "version", "deleted", batchId = 0L)
    // crashed staging garbage must be invisible to readers
    Seq((99L, "junk", 0.0)).toDF("k", "tag", "v")
      .write.parquet(logPath + "/_staging/delta-1")
    assert(logState(logPath) === Set((1L, "a", 10.0), (2L, "b", 20.0)))
    CdcLog.appendBatch(
      changes((1L, "a", 11.0, 2L, false), (2L, "b", 0.0, 2L, true)),
      logPath, Seq("k"), "version", "deleted", batchId = 1L)
    assert(logState(logPath) === Set((1L, "a", 11.0)))
    // replaying a committed id with different (stale) data: no-op
    CdcLog.appendBatch(
      changes((1L, "a", 99.0, 9L, false)),
      logPath, Seq("k"), "version", "deleted", batchId = 1L)
    assert(logState(logPath) === Set((1L, "a", 11.0)))

    // keep pre-compaction segments to fake a crash below
    val saved = Files.createTempDirectory("graft-cdc-saved").toString
    FileUtil.copy(
      fs, new Path(logPath, "delta"), fs, new Path(saved, "delta"),
      false, conf)

    def dataSegs(): Set[String] =
      fs.listStatus(new Path(logPath, "delta"))
        .filter(s =>
          s.isDirectory && s.getPath.getName.startsWith("batch=") &&
            fs.listStatus(s.getPath).exists(f =>
              f.isFile && !f.getPath.getName.startsWith("_")))
        .map(_.getPath.getName)
        .toSet

    CdcLog.compact(spark, logPath, Seq("k"))
    assert(dataSegs() === Set("batch=c1"))
    // folded originals are marker-only tombstones: replay still no-ops
    for (b <- Seq("batch=0", "batch=1"))
      assert(graft.streaming.SnapshotCommit.isCommitted(
        fs, new Path(logPath, s"delta/$b")))
    CdcLog.appendBatch(
      changes((1L, "a", 99.0, 9L, false)),
      logPath, Seq("k"), "version", "deleted", batchId = 1L)
    assert(dataSegs() === Set("batch=c1"))
    assert(logState(logPath) === Set((1L, "a", 11.0)))
    // the compacted segment RETAINS k=2's delete tombstone row
    assert(
      spark.read.parquet(s"$logPath/delta/batch=c1")
        .where(col("k") === 2L && col("deleted")).count() === 1L)

    // crash mid-tombstoning: a folded original reappears next to c1 —
    // the fold must not resurrect the deleted key, and the repair
    // (next compact) re-tombstones it
    fs.delete(new Path(logPath, "delta/batch=0"), true)
    FileUtil.copy(
      fs, new Path(saved, "delta/batch=0"), fs,
      new Path(logPath, "delta/batch=0"), false, conf)
    assert(logState(logPath) === Set((1L, "a", 11.0)))
    CdcLog.compact(spark, logPath, Seq("k"))
    assert(dataSegs() === Set("batch=c1"))
    assert(logState(logPath) === Set((1L, "a", 11.0)))

    // appends continue after compaction; a later batch beats the fold
    CdcLog.appendBatch(
      changes((2L, "b", 22.0, 1L, false), (3L, "c", 30.0, 1L, false)),
      logPath, Seq("k"), "version", "deleted", batchId = 2L)
    assert(logState(logPath) ===
      Set((1L, "a", 11.0), (2L, "b", 22.0), (3L, "c", 30.0)))
    CdcLog.compact(spark, logPath, Seq("k"))
    assert(dataSegs() === Set("batch=c2"))
    assert(logState(logPath) ===
      Set((1L, "a", 11.0), (2L, "b", 22.0), (3L, "c", 30.0)))
  }

  test("log CDC: a change feed carrying the reserved __batch column is rejected") {
    import graft.streaming.CdcLog
    val logPath = Files.createTempDirectory("graft-cdc-l4").toString + "/log"
    val bad = changes((1L, "a", 10.0, 1L, false))
      .withColumn("__batch", lit(7L))
    val e = intercept[IllegalArgumentException] {
      CdcLog.appendBatch(bad, logPath, Seq("k"), "version", "deleted", 0L)
    }
    assert(e.getMessage.contains("__batch"))
  }

  test("log CDC: a superseded crashed fold is reclaimed, not leaked forever") {
    import graft.streaming.CdcLog
    import org.apache.hadoop.fs.Path
    val logPath = Files.createTempDirectory("graft-cdc-l5").toString + "/log"
    val fs = new Path(logPath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

    CdcLog.appendBatch(
      changes((1L, "a", 10.0, 1L, false)),
      logPath, Seq("k"), "version", "deleted", batchId = 0L)
    CdcLog.appendBatch(
      changes((2L, "b", 20.0, 1L, false)),
      logPath, Seq("k"), "version", "deleted", batchId = 1L)
    // fake a fold toward maxId=1 that crashed BEFORE its marker: an
    // unmarked batch=c1 with a full folded copy, plus its staging dir
    changes((1L, "a", 10.0, 1L, false), (2L, "b", 20.0, 1L, false))
      .withColumn("__batch", lit(1L))
      .write.parquet(s"$logPath/delta/batch=c1")
    changes((1L, "a", 10.0, 1L, false))
      .write.parquet(s"$logPath/_staging/compact-1")
    // unmarked → invisible to readers
    assert(logState(logPath) === Set((1L, "a", 10.0), (2L, "b", 20.0)))
    // maxId advances past the crash; the next compact targets c2 and
    // must reclaim the orphaned c1 + its staging, which nothing else
    // would ever touch again
    CdcLog.appendBatch(
      changes((3L, "c", 30.0, 1L, false)),
      logPath, Seq("k"), "version", "deleted", batchId = 2L)
    CdcLog.compact(spark, logPath, Seq("k"))
    assert(!fs.exists(new Path(s"$logPath/delta/batch=c1")))
    assert(!fs.exists(new Path(s"$logPath/_staging/compact-1")))
    assert(graft.streaming.SnapshotCommit.isCommitted(
      fs, new Path(s"$logPath/delta/batch=c2")))
    assert(logState(logPath) ===
      Set((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0)))
  }

  test("log CDC time travel: readAt folds only segments up to the asked batch") {
    import graft.streaming.CdcLog
    val logPath = Files.createTempDirectory("graft-cdc-l6").toString + "/log"
    // batch 0: k=1,2; batch 1: delete k=1, update k=2; batch 2: re-insert k=1
    CdcLog.appendBatch(
      changes((1L, "a", 10.0, 1L, false), (2L, "b", 20.0, 1L, false)),
      logPath, Seq("k"), "version", "deleted", batchId = 0L)
    CdcLog.appendBatch(
      changes((1L, "a", 0.0, 2L, true), (2L, "b2", 21.0, 2L, false)),
      logPath, Seq("k"), "version", "deleted", batchId = 1L)
    CdcLog.appendBatch(
      changes((1L, "a3", 12.0, 3L, false)),
      logPath, Seq("k"), "version", "deleted", batchId = 2L)

    def at(b: Long): Set[(Long, String, Double)] =
      CdcLog.readAt(spark, logPath, Seq("k"), b)
        .get.as[(Long, String, Double)].collect().toSet

    assert(CdcLog.readAt(spark, logPath, Seq("k"), -1L).isEmpty)
    assert(at(0L) === Set((1L, "a", 10.0), (2L, "b", 20.0)))
    assert(at(1L) === Set((2L, "b2", 21.0))) // k=1 deleted as of batch 1
    assert(at(2L) === Set((1L, "a3", 12.0), (2L, "b2", 21.0)))
    // asOf past the head = the current state = read()
    assert(at(99L) === logState(logPath))
  }

  test("log CDC time travel: history folded past asOf fails loudly") {
    import graft.streaming.CdcLog
    val logPath = Files.createTempDirectory("graft-cdc-l7").toString + "/log"
    CdcLog.appendBatch(
      changes((1L, "a", 10.0, 1L, false)),
      logPath, Seq("k"), "version", "deleted", batchId = 0L)
    CdcLog.appendBatch(
      changes((2L, "b", 20.0, 1L, false)),
      logPath, Seq("k"), "version", "deleted", batchId = 1L)
    CdcLog.compact(spark, logPath, Seq("k"))
    // compaction folded batches 0-1 into c1: state at 0 is gone — the
    // partial fold of surviving originals must NOT be returned silently
    val e = intercept[IllegalArgumentException] {
      CdcLog.readAt(spark, logPath, Seq("k"), 0L)
    }
    assert(e.getMessage.contains("c1"))
    // at-or-after the compacted id still works, through the c segment
    assert(CdcLog.readAt(spark, logPath, Seq("k"), 1L).get
      .as[(Long, String, Double)].collect().toSet ===
      Set((1L, "a", 10.0), (2L, "b", 20.0)))
  }

  test("log CDC streamed: state equals the batch fold (memory stream)") {
    import graft.streaming.CdcLog
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val logPath = Files.createTempDirectory("graft-cdc-l3").toString + "/log"
    val ckpt = Files.createTempDirectory("graft-cdc-l3-ckpt").toString

    val input = MemoryStream[(Long, String, Double, Long, Boolean)]
    val q = CdcLog.start(
      input.toDS().toDF("k", "tag", "v", "version", "deleted"),
      logPath, ckpt, keys = Seq("k"))
    try {
      input.addData((1L, "a", 10.0, 1L, false), (2L, "b", 20.0, 1L, false))
      q.processAllAvailable()
      assert(logState(logPath) === Set((1L, "a", 10.0), (2L, "b", 20.0)))
      input.addData((1L, "a", 12.0, 3L, false), (2L, "b", 0.0, 2L, true),
        (9L, "z", 90.0, 2L, false))
      q.processAllAvailable()
      assert(logState(logPath) === Set((1L, "a", 12.0), (9L, "z", 90.0)))
    } finally q.stop()
  }
}
