package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.Multimodal
import graft.streaming.{AudioIngest, ImageIngest, Sig64Ingest}

/** The signature-agnostic 64-bit banded-Hamming streaming ingest
  * ([[Sig64Ingest]]) and its image/audio wrappers: intra-batch and
  * against-corpus dedup, replay idempotence, crash repair, and
  * compaction — the StreamingSpec near-dup suite on the perceptual
  * index family.
  */
class Sig64IngestSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ingested(idx: String): Set[Long] =
    Sig64Ingest.ingestedIds(spark, idx).get.as[Long].collect().toSet

  test("sig64 ingest: intra + cross-batch dedup, replay and crash repair") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val idx = Files.createTempDirectory("graft-s64").toString + "/s64"
    val ckpt = Files.createTempDirectory("graft-s64-ckpt").toString

    val A = 0L
    val nearA = 0x13L // 3 bits from A — within the budget of 5
    val farButColliding = 0xFF00FF00FF00FF00L // shares A's four zero
    // band keys (candidate in 4 buckets) but hamming 32 — the inline
    // verify, not the banding, must reject it
    val novel = 0x123456789ABCDEFL

    val input = MemoryStream[(Long, Long)]
    val q = Sig64Ingest.start(input.toDS().toDF("id", "sig"), idx, ckpt)
    try {
      // batch 0: 2 is an intra-batch near-dup of 1; 10 collides in
      // four bands but fails Hamming verification
      input.addData((1L, A), (2L, nearA), (10L, farButColliding))
      q.processAllAvailable()
      assert(ingested(idx) === Set(1L, 10L))
      // batch 1: 3 is a CROSS-batch near-dup of 1; 20 is novel
      input.addData((3L, nearA ^ 2L), (20L, novel))
      q.processAllAvailable()
      assert(ingested(idx) === Set(1L, 10L, 20L))
    } finally q.stop()

    // replaying a committed batch id is a no-op (markers short-circuit)
    Sig64Ingest.ingestBatch(
      Seq((1L, A), (2L, nearA), (10L, farButColliding)).toDF("id", "sig"),
      idx, "sig", "id", batchId = 0L)
    assert(ingested(idx) === Set(1L, 10L, 20L))

    // crashed partial publish: the buckets twin vanishes; the replay
    // rebuilds both segments without flagging the batch against its
    // own half-committed signatures
    val b2 = Seq((30L, 0x5555000055550000L)).toDF("id", "sig")
    Sig64Ingest.ingestBatch(b2, idx, "sig", "id", batchId = 2L)
    assert(ingested(idx) === Set(1L, 10L, 20L, 30L))
    val fs = new org.apache.hadoop.fs.Path(idx)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(idx, "buckets/batch=2"), true)
    Sig64Ingest.ingestBatch(b2, idx, "sig", "id", batchId = 2L)
    assert(ingested(idx) === Set(1L, 10L, 20L, 30L))
    // the rebuilt buckets are live: a near-dup of 30 is caught
    Sig64Ingest.ingestBatch(
      Seq((31L, 0x5555000055550001L)).toDF("id", "sig"),
      idx, "sig", "id", batchId = 3L)
    assert(ingested(idx) === Set(1L, 10L, 20L, 30L))
    // parameter drift refuses loudly, not silently
    val e = intercept[IllegalArgumentException] {
      Sig64Ingest.ingestBatch(
        Seq((40L, 7L)).toDF("id", "sig"), idx, "sig", "id",
        batchId = 4L, bands = 4, maxHamming = 3)
    }
    assert(e.getMessage.contains("sig64 index"))
  }

  test("sig64 compaction: one segment per tree, probe still catches dups") {
    val idx = Files.createTempDirectory("graft-s64c").toString + "/s64"
    Sig64Ingest.ingestBatch(
      Seq((1L, 0L), (10L, 0x0F0F0F0F0F0F0F0FL)).toDF("id", "sig"),
      idx, "sig", "id", batchId = 0L)
    Sig64Ingest.ingestBatch(
      Seq((20L, 0x7700770077007700L)).toDF("id", "sig"),
      idx, "sig", "id", batchId = 1L)
    Sig64Ingest.compact(spark, idx)
    val fs = new org.apache.hadoop.fs.Path(idx)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def dataSegs(tree: String): Seq[String] =
      fs.listStatus(new org.apache.hadoop.fs.Path(idx, tree))
        .filter(s => s.isDirectory &&
          fs.listStatus(s.getPath).exists(f =>
            f.isFile && !f.getPath.getName.startsWith("_")))
        .map(_.getPath.getName).toSeq
    assert(dataSegs("sig") === Seq("batch=c1"))
    assert(dataSegs("buckets") === Seq("batch=c1"))
    assert(ingested(idx) === Set(1L, 10L, 20L))
    // post-compaction probe: near-dups of batch-0 AND batch-1 docs
    // both resolve against the folded segment
    Sig64Ingest.ingestBatch(
      Seq((30L, 1L), (31L, 0x7700770077007701L), (32L, 0x00FF00FF00FF00FFL))
        .toDF("id", "sig"),
      idx, "sig", "id", batchId = 2L)
    assert(ingested(idx) === Set(1L, 10L, 20L, 32L))
  }

  test("forced gatherCapped fallback (the bench hook) agrees with the fused path") {
    // the same batches through the fused shape and through the
    // distributed shape forced by the graft.ingest.forceUnfused
    // JVM-prop hook (what StreamBench's neardup_ingest_fallback rep
    // sets) must ingest identical survivor sets — the fallback-
    // equivalence contract, asserted via the exact hook the bench uses
    def runTo(idx: String, force: Boolean): Set[Long] = {
      def batch(rows: Seq[(Long, Long)], id: Long): Unit = {
        if (force) sys.props(graft.operators.Dedup.ForceUnfusedProp) = "1"
        try Sig64Ingest.ingestBatch(
          rows.toDF("id", "sig"), idx, "sig", "id", batchId = id)
        finally sys.props.remove(graft.operators.Dedup.ForceUnfusedProp)
      }
      batch(Seq((1L, 0L), (2L, 0x13L), (10L, 0x123456789ABCDEFL)), 0L)
      batch(Seq((3L, 0x11L), (20L, 0x7700770077007700L)), 1L)
      ingested(idx)
    }
    val fused = runTo(
      Files.createTempDirectory("graft-s64f").toString + "/s64", force = false)
    val forced = runTo(
      Files.createTempDirectory("graft-s64ff").toString + "/s64", force = true)
    assert(fused === forced)
    assert(fused === Set(1L, 10L, 20L))
  }

  test("sig64 unfused path (non-fusable id type) agrees on survivors") {
    // decimal ids force the distributed (unfused) shape end-to-end
    val idx = Files.createTempDirectory("graft-s64u").toString + "/s64"
    val b0 = Seq(
      (BigDecimal(1), 0L),
      (BigDecimal(2), 0x13L),
      (BigDecimal(10), 0x123456789ABCDEFL)).toDF("id", "sig")
    Sig64Ingest.ingestBatch(b0, idx, "sig", "id", batchId = 0L)
    val got0 = Sig64Ingest.ingestedIds(spark, idx).get
      .as[BigDecimal].collect().map(_.toLong).toSet
    assert(got0 === Set(1L, 10L))
    Sig64Ingest.ingestBatch(
      Seq((BigDecimal(3), 0x11L), (BigDecimal(20), 0x7700770077007700L))
        .toDF("id", "sig"),
      idx, "sig", "id", batchId = 1L)
    val got1 = Sig64Ingest.ingestedIds(spark, idx).get
      .as[BigDecimal].collect().map(_.toLong).toSet
    assert(got1 === Set(1L, 10L, 20L))
  }

  test("image ingest end-to-end: planted pattern copies dedup, corrupt quarantines") {
    val idx = Files.createTempDirectory("graft-img-ing").toString + "/img"
    // imageAssetsFromIds: ids sharing id % 25 are perceptual near-dups
    def assets(ids: Seq[Long]) = Multimodal.imageAssetsFromIds(
      ids.toDF("doc_id"), "doc_id")
    // batch 0: 1 and 26 share pattern 1 (intra dup); 2 is distinct
    ImageIngest.ingestBatch(
      assets(Seq(1L, 26L, 2L)), idx, "data", "id", batchId = 0L)
    assert(ingested(idx) === Set(1L, 2L))
    // batch 1: 51 is a CROSS-batch near-dup of 1 (pattern 1); 3 novel;
    // a corrupt payload quarantines (absent, not fatal)
    val b1 = assets(Seq(51L, 3L)).unionByName(
      Seq((99L, "not an image".getBytes("UTF-8")))
        .toDF("id", "data")
        .select(col("id"), col("data"),
          struct(lit("image").as("modality"), lit(0L).as("n_bytes"),
            lit(0).as("width"), lit(0).as("height")).as("meta")))
    ImageIngest.ingestBatch(b1, idx, "data", "id", batchId = 1L)
    assert(ingested(idx) === Set(1L, 2L, 3L))
  }

  test("audio ingest end-to-end: melody variants dedup across batches") {
    val idx = Files.createTempDirectory("graft-aud-ing").toString + "/aud"
    def assets(ids: Seq[Long]) = Multimodal.melodyAssetsFromIds(
      ids.toDF("doc_id"), "doc_id")
    // melodyAssetsFromIds: pattern = id % 25, variant = (id/25) % 3.
    // batch 0: 1 (pattern 1 original) and 26 (pattern 1 gain copy)
    // intra-dedup; 2 (pattern 2) survives
    AudioIngest.ingestBatch(
      assets(Seq(1L, 26L, 2L)), idx, "data", "id", batchId = 0L)
    assert(ingested(idx) === Set(1L, 2L))
    // batch 1: 51 (pattern 1 resampled) is a cross-batch dup of 1;
    // 3 (pattern 3) is novel
    AudioIngest.ingestBatch(
      assets(Seq(51L, 3L)), idx, "data", "id", batchId = 1L)
    assert(ingested(idx) === Set(1L, 2L, 3L))
  }
}
