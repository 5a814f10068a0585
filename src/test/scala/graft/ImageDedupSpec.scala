package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.Multimodal

/** Perceptual (dHash) image near-dup: planted re-encoded / resized /
  * brightness-shifted copies must cluster; structurally distinct
  * images must not. The hash itself is pinned for its documented
  * invariances before the banded pipeline is exercised end to end.
  */
class ImageDedupSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  import java.awt.image.BufferedImage

  private def encode(img: BufferedImage, fmt: String): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, fmt, bos)
    bos.toByteArray
  }

  /** Horizontal luminance gradient with a pattern-dependent slope —
    * enough structure for dHash to have signal in every row.
    */
  private def gradient(
      w: Int,
      h: Int,
      slope: Int,
      phase: Int,
      shift: Int = 0): BufferedImage = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val v = math.min(255, (phase + x * slope) % 240 + shift)
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
        x += 1
      }
      y += 1
    }
    img
  }

  private def ham(a: Long, b: Long): Int =
    java.lang.Long.bitCount(a ^ b)

  test("dHash invariances: re-encode exact, brightness shift exact, resize near") {
    val base = gradient(64, 48, 7, 20)
    val sig = Multimodal.dHashBytes(encode(base, "png")).get
    // identical pixels, different container → identical hash
    assert(Multimodal.dHashBytes(encode(base, "bmp")).get === sig)
    // uniform brightness shift preserves every gradient sign
    val bright = gradient(64, 48, 7, 20, shift = 10)
    assert(Multimodal.dHashBytes(encode(bright, "png")).get === sig)
    // a half-size resample of the same gradient field lands within the
    // banding budget, not a world away
    val small = gradient(32, 24, 14, 20)
    assert(ham(Multimodal.dHashBytes(encode(small, "png")).get, sig) <= 3)
    // a different slope/phase is a different image
    val other = gradient(64, 48, 23, 140)
    assert(ham(Multimodal.dHashBytes(encode(other, "png")).get, sig) > 10)
    // corrupt bytes quarantine
    assert(Multimodal.dHashBytes("not an image".getBytes("UTF-8")).isEmpty)
  }

  test("imageNearDup clusters planted copies and separates distinct images") {
    def asset(id: Long, img: BufferedImage, fmt: String = "png") =
      (id, encode(img, fmt))
    val a = gradient(64, 48, 7, 20)
    val b = gradient(64, 48, 23, 140)
    val c = gradient(64, 48, 3, 200)
    val rows = Seq(
      asset(1L, a), // family A original
      asset(2L, a, "bmp"), // re-encoded copy
      asset(3L, gradient(64, 48, 7, 20, shift = 8)), // brightness copy
      asset(4L, gradient(32, 24, 14, 20)), // resized copy
      asset(10L, b), // family B original
      asset(11L, b, "bmp"), // re-encoded copy
      asset(20L, c), // singleton
      (30L, "corrupt".getBytes("UTF-8"))) // quarantined
    val assets = rows
      .toDF("id", "data")
      .select(
        col("id"),
        col("data"),
        struct(lit("image").as("modality"), lit(0L).as("n_bytes"),
          lit(0).as("width"), lit(0).as("height")).as("meta"))
    val got = Multimodal
      .imageNearDup(assets)
      .select("id", "component", "canonical")
      .as[(Long, Long, Boolean)]
      .collect()
      .map(r => r._1 -> ((r._2, r._3)))
      .toMap
    // corrupt row is absent; every decodable asset present
    assert(got.keySet === Set(1L, 2L, 3L, 4L, 10L, 11L, 20L))
    // family A clusters under min-id 1; family B under 10; c alone
    assert(Seq(1L, 2L, 3L, 4L).forall(id => got(id)._1 === 1L))
    assert(Seq(10L, 11L).forall(id => got(id)._1 === 10L))
    assert(got(20L)._1 === 20L)
    // exactly one canonical per component, at the min id
    assert(got.filter(_._2._2).keySet === Set(1L, 10L, 20L))
  }

  test("synthesized asset families (the q207 corpus) cluster by pattern") {
    val ids = (0L until 75L).toDF("doc_id")
    val comp = Multimodal
      .imageNearDup(Multimodal.imageAssetsFromIds(ids, "doc_id"))
      .select("id", "component")
      .as[(Long, Long)]
      .collect()
      .toMap
    assert(comp.size === 75)
    // ids 0, 25, 50 share pattern 0 with brightness shifts 0/2/4 —
    // dHash-identical, must share a component (min id 0)
    assert(comp(0L) === 0L && comp(25L) === 0L && comp(50L) === 0L)
    // same for every other pattern family
    (0L until 25L).foreach { p =>
      assert(comp(p + 25L) === comp(p), s"pattern $p")
      assert(comp(p + 50L) === comp(p), s"pattern $p")
    }
  }
}
