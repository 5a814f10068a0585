package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.Multimodal
import graft.streaming.VideoIngest

/** Perceptual video near-dup (frame-sampled dHash, per-bit majority):
  * planted MJPEG-re-encoded / block-resized / brightness-shifted copies
  * must cluster; clips with a different gradient pattern must not. The
  * fingerprint is pinned for its documented invariances — including
  * exact equality with the STILL-IMAGE dHash on a 1-frame clip — before
  * the banded pipeline and the streaming ingest are exercised end to
  * end. The AudioDedupSpec template on the video modality.
  */
class VideoDedupSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ham(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)

  private val W = 18
  private val H = 16

  /** One gradient DIB frame (B,G,R bottom-up, 4-byte stride) — the
    * q215 pixel family, generated here independently so the spec does
    * not trust the production generator for its own fixtures.
    */
  private def gradFrame(p: Int, w: Int, h: Int, shift: Int): Array[Byte] = {
    val stride = ((w * 3 + 3) / 4) * 4
    val dib = new Array[Byte](stride * h)
    var vy = 0
    while (vy < h) {
      val off = (h - 1 - vy) * stride
      var x = 0
      while (x < w) {
        val r = (23 * p + x * (10 + (p % 7) * 6)) % 240 + shift
        val g = (91 * p + vy * (8 + (p % 5) * 7)) % 240 + shift
        val b = (53 * p + (x + vy) * (6 + (p % 3) * 9)) % 240 + shift
        dib(off + x * 3) = b.toByte
        dib(off + x * 3 + 1) = g.toByte
        dib(off + x * 3 + 2) = r.toByte
        x += 1
      }
      vy += 1
    }
    dib
  }

  /** Block-upscale a DIB frame by an integer factor (each pixel → a
    * k×k block). At W divisible by 9 and H by 8, every dHash cell of
    * the upscale averages exactly the source cell's pixels, so the
    * signature must be BIT-IDENTICAL.
    */
  private def blockUpscale(
      dib: Array[Byte], w: Int, h: Int, k: Int): Array[Byte] = {
    val srcStride = ((w * 3 + 3) / 4) * 4
    val dw = w * k
    val dh = h * k
    val dstStride = ((dw * 3 + 3) / 4) * 4
    val out = new Array[Byte](dstStride * dh)
    var y = 0
    while (y < dh) {
      val sy = y / k
      var x = 0
      while (x < dw) {
        val sx = x / k
        var c = 0
        while (c < 3) {
          out(y * dstStride + x * 3 + c) = dib(sy * srcStride + sx * 3 + c)
          c += 1
        }
        x += 1
      }
      y += 1
    }
    out
  }

  private def clip(p: Int, nFrames: Int = 6, shift: Int = 0): Array[Byte] =
    Multimodal.synthAviFromDibs(
      W, H, (0 until nFrames).map(f => gradFrame(p, W, H, shift + 2 * (f % 3))))

  test("fingerprint invariances: mjpeg near, brightness/resize/fps exact") {
    val frames = (0 until 6).map(f => gradFrame(7, W, H, 2 * (f % 3)))
    val raw = Multimodal.synthAviFromDibs(W, H, frames)
    val sig = Multimodal.videoFingerprintBytes(raw).get
    // MJPEG re-encode of the IDENTICAL frames: lossy, so near not
    // exact — majority voting absorbs per-frame flips
    val mjpeg = Multimodal.synthMjpegFromDibs(W, H, frames)
    assert(ham(Multimodal.videoFingerprintBytes(mjpeg).get, sig) <= 4)
    // uniform brightness shift preserves every gradient sign → exact
    val bright = Multimodal.synthAviFromDibs(
      W, H, (0 until 6).map(f => gradFrame(7, W, H, 4 + 2 * (f % 3))))
    assert(Multimodal.videoFingerprintBytes(bright).get === sig)
    // 2× block upscale: cells align exactly at 18×16 → bit-identical
    val resized = Multimodal.synthAviFromDibs(
      W * 2, H * 2, frames.map(blockUpscale(_, W, H, 2)))
    assert(Multimodal.videoFingerprintBytes(resized).get === sig)
    // doubled frame count (each frame twice — a re-encode at 2× fps):
    // relative-position sampling + majority lands on the same bits
    val doubled = Multimodal.synthAviFromDibs(
      W, H, frames.flatMap(f => Seq(f, f)))
    assert(Multimodal.videoFingerprintBytes(doubled).get === sig)
    // one outlier frame in six cannot outvote the majority
    val noisy = Multimodal.synthAviFromDibs(
      W, H, frames.updated(3, gradFrame(19, W, H, 0)))
    assert(Multimodal.videoFingerprintBytes(noisy).get === sig)
    // a different gradient pattern is a different clip
    val other = Multimodal.videoFingerprintBytes(clip(19)).get
    assert(ham(other, sig) > 12)
    // corrupt bytes quarantine
    assert(Multimodal
      .videoFingerprintBytes("not a video".getBytes("UTF-8")).isEmpty)
  }

  test("1-frame clip fingerprint equals the still-image dHash") {
    // same pixels as a PNG through the image path and as a 1-frame AVI
    // through the video path: dHashFromLum is shared, so the 64 bits
    // must be IDENTICAL — pins the DIB bottom-up/BGR/stride handling
    val p = 11
    val img = new java.awt.image.BufferedImage(
      W, H, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < H) {
      var x = 0
      while (x < W) {
        val r = (23 * p + x * (10 + (p % 7) * 6)) % 240
        val g = (91 * p + y * (8 + (p % 5) * 7)) % 240
        val b = (53 * p + (x + y) * (6 + (p % 3) * 9)) % 240
        img.setRGB(x, y, (r << 16) | (g << 8) | b)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val still = Multimodal.dHashBytes(bos.toByteArray).get
    val one = Multimodal.synthAviFromDibs(W, H, Seq(gradFrame(p, W, H, 0)))
    assert(Multimodal.videoFingerprintBytes(one).get === still)
  }

  test("q218 vote corpus: every variant replays the arithmetic cell formula") {
    // the q218 oracle's closed form, computed here independently of
    // both the production generator and the decode path: each 9×8
    // dHash cell of the 18×16 gradient is a 2×2 pixel block whose luma
    // sum collapses to integer arithmetic in the pattern alone (shift
    // and wobble add exactly 4000·s pre-division — divisible by 4 —
    // so every cell COMPARISON is shift-free)
    def arithmeticSig(p: Int): Long = {
      def cell(cy: Int, cx: Int): Long = {
        val ra = (23 * p + (2 * cx) * (10 + (p % 7) * 6)) % 240
        val rb = (23 * p + (2 * cx + 1) * (10 + (p % 7) * 6)) % 240
        val ga = (91 * p + (2 * cy) * (8 + (p % 5) * 7)) % 240
        val gb = (91 * p + (2 * cy + 1) * (8 + (p % 5) * 7)) % 240
        val ba = (53 * p + (2 * cx + 2 * cy) * (6 + (p % 3) * 9)) % 240
        val bb = (53 * p + (2 * cx + 2 * cy + 1) * (6 + (p % 3) * 9)) % 240
        val bc = (53 * p + (2 * cx + 2 * cy + 2) * (6 + (p % 3) * 9)) % 240
        (598L * (ra + rb) + 1174L * (ga + gb) + 114L * (ba + 2 * bb + bc)) / 4
      }
      var sig = 0L
      for (cy <- 0 until 8; cx <- 0 until 8)
        if (cell(cy, cx + 1) > cell(cy, cx)) sig |= 1L << (cy * 8 + cx)
      sig
    }
    // all 25 patterns × 3 variants through the REAL pipeline (AVI
    // encode → RIFF parse → DIB decode → frame-sampled dHash →
    // majority vote) must land on the closed form — including the
    // 6-frame variants whose outlier frame the 5-vs-1 vote suppresses
    // and the 11-frame variant whose outliers the t·n/9 sampler skips
    val ids = spark.range(75).toDF("doc_id")
    val sigs = Multimodal
      .videoFingerprints(
        Multimodal.videoVoteAssetsFromIds(ids, "doc_id"))
      .collect()
      .map(r => r.getLong(0) -> r.getLong(1))
      .toMap
    assert(sigs.size === 75)
    for ((id, sig) <- sigs)
      assert(
        sig === arithmeticSig((id % 25).toInt),
        s"id=$id variant=${id / 25}")
    // the suppression is real: the outlier pattern's own signature
    // differs from the base's, so an unweighted mean would have moved
    val p = 3
    assert(arithmeticSig(p) !== arithmeticSig(p + 1))
  }

  test("videoNearDup clusters planted copies and separates patterns") {
    val framesA = (0 until 6).map(f => gradFrame(1, W, H, 2 * (f % 3)))
    val rows = Seq(
      (1L, clip(1)), // family A original
      (2L, Multimodal.synthMjpegFromDibs(W, H, framesA)), // re-encode
      (3L, clip(1, shift = 4)), // brightness copy
      (4L, Multimodal.synthAviFromDibs( // 2× resized copy
        W * 2, H * 2, framesA.map(blockUpscale(_, W, H, 2)))),
      (10L, clip(9)), // family B original
      (11L, clip(9, shift = 6)), // family B brightness copy
      (20L, clip(22)), // singleton
      (30L, "corrupt".getBytes("UTF-8"))) // quarantined
    val assets = rows
      .toDF("id", "data")
      .select(
        col("id"), col("data"),
        struct(lit("video").as("modality"), lit(0L).as("n_bytes"),
          lit(W).as("width"), lit(H).as("height")).as("meta"))
    val got = Multimodal
      .videoNearDup(assets)
      .select("id", "component", "canonical")
      .as[(Long, Long, Boolean)]
      .collect()
      .map(r => r._1 -> ((r._2, r._3)))
      .toMap
    assert(got.keySet === Set(1L, 2L, 3L, 4L, 10L, 11L, 20L))
    assert(Seq(1L, 2L, 3L, 4L).forall(id => got(id)._1 === 1L))
    assert(Seq(10L, 11L).forall(id => got(id)._1 === 10L))
    assert(got(20L)._1 === 20L)
    assert(got.filter(_._2._2).keySet === Set(1L, 10L, 20L))
  }

  test("synthesized asset families (the q215 corpus) cluster by pattern") {
    val ids = (0L until 75L).toDF("doc_id")
    val comp = Multimodal
      .videoNearDup(Multimodal.videoDupAssetsFromIds(ids, "doc_id"))
      .select("id", "component")
      .as[(Long, Long)]
      .collect()
      .toMap
    assert(comp.size === 75)
    // ids p, p+25, p+50 share pattern p as raw / mjpeg-re-encoded /
    // brightness variants — must share a component rooted at min id p
    (0L until 25L).foreach { p =>
      assert(comp(p) === p, s"pattern $p root")
      assert(comp(p + 25L) === p, s"pattern $p mjpeg variant")
      assert(comp(p + 50L) === p, s"pattern $p brightness variant")
    }
  }

  test("video ingest end-to-end: variants dedup across batches, replay no-op") {
    val idx = Files.createTempDirectory("graft-vid-ing").toString + "/vid"
    def ingested: Set[Long] = VideoIngest
      .ingestedIds(spark, idx).get.as[Long].collect().toSet
    def assets(ids: Seq[Long]) =
      Multimodal.videoDupAssetsFromIds(ids.toDF("doc_id"), "doc_id")
    // batch 0: 1 (pattern 1 raw) and 26 (pattern 1 mjpeg re-encode)
    // intra-dedup; 2 (pattern 2) survives
    VideoIngest.ingestBatch(
      assets(Seq(1L, 26L, 2L)), idx, "data", "id", batchId = 0L)
    assert(ingested === Set(1L, 2L))
    // batch 1: 51 is a CROSS-batch near-dup of 1 (pattern 1 brightness
    // variant); 3 novel; a corrupt payload quarantines (absent, not
    // fatal)
    val b1 = assets(Seq(51L, 3L)).unionByName(
      Seq((99L, "not a video".getBytes("UTF-8")))
        .toDF("id", "data")
        .select(col("id"), col("data"),
          struct(lit("video").as("modality"), lit(0L).as("n_bytes"),
            lit(0).as("width"), lit(0).as("height")).as("meta")))
    VideoIngest.ingestBatch(b1, idx, "data", "id", batchId = 1L)
    assert(ingested === Set(1L, 2L, 3L))
    // replaying a committed batch id is a no-op (markers short-circuit)
    VideoIngest.ingestBatch(
      assets(Seq(1L, 26L, 2L)), idx, "data", "id", batchId = 0L)
    assert(ingested === Set(1L, 2L, 3L))
    // compaction folds the index; the probe still catches dups
    VideoIngest.compact(spark, idx)
    VideoIngest.ingestBatch(
      assets(Seq(76L, 4L)), idx, "data", "id", batchId = 2L)
    // 76 = pattern 1 mjpeg variant of ingested 1 → dropped; 4 novel
    assert(ingested === Set(1L, 2L, 3L, 4L))
  }
}
