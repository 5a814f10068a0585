package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.Multimodal

/** Perceptual (spectral-band sign) audio near-dup: planted re-encoded /
  * gain-shifted / resampled copies must cluster; melodies with a
  * different pitch walk must not. The fingerprint is pinned for its
  * documented invariances before the banded pipeline is exercised end
  * to end — the ImageDedupSpec template on the audio modality.
  */
class AudioDedupSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ham(a: Long, b: Long): Int =
    java.lang.Long.bitCount(a ^ b)

  /** Re-encode the same PCM into a different container/encoding via
    * the SAME JDK conversion stack the decoder uses.
    */
  private def transcode(
      wav: Array[Byte],
      target: javax.sound.sampled.AudioFormat.Encoding,
      fileType: javax.sound.sampled.AudioFileFormat.Type): Array[Byte] = {
    import javax.sound.sampled._
    val in = AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(wav))
    val out = AudioSystem.getAudioInputStream(target, in)
    val bos = new java.io.ByteArrayOutputStream()
    AudioSystem.write(out, fileType, bos)
    bos.toByteArray
  }

  test("fingerprint invariances: container exact, gain exact, resample/ULAW near") {
    import javax.sound.sampled.{AudioFileFormat, AudioFormat}
    val base = Multimodal.synthMelodyWav(3)
    val sig = Multimodal.audioFingerprintBytes(base).get
    // identical samples, AIFF container (big-endian PCM) → identical
    // fingerprint: decodePcm16 normalizes before any feature math
    val aiff = transcode(
      base, AudioFormat.Encoding.PCM_SIGNED, AudioFileFormat.Type.AIFF)
    assert(Multimodal.audioFingerprintBytes(aiff).get === sig)
    // uniform gain scales every band energy by g² — strict compares
    // keep their sign, fingerprint is bit-identical
    val quiet = Multimodal.synthMelodyWav(3, amplitude = 0.4)
    assert(Multimodal.audioFingerprintBytes(quiet).get === sig)
    // the same melody at 11 025 Hz is an ideal resample: frames are
    // relative positions, bands absolute Hz → within the band budget
    val resampled = Multimodal.synthMelodyWav(3, rate = 11025f)
    assert(ham(Multimodal.audioFingerprintBytes(resampled).get, sig) <= 5)
    // lossy ULAW re-encode adds quantization noise, not structure
    val ulaw = transcode(
      base, AudioFormat.Encoding.ULAW, AudioFileFormat.Type.WAVE)
    assert(ham(Multimodal.audioFingerprintBytes(ulaw).get, sig) <= 5)
    // a different pitch walk is a different clip
    val other = Multimodal.synthMelodyWav(17)
    assert(ham(Multimodal.audioFingerprintBytes(other).get, sig) > 12)
    // corrupt bytes and too-short clips quarantine
    assert(Multimodal.audioFingerprintBytes("not audio".getBytes("UTF-8")).isEmpty)
    assert(Multimodal
      .audioFingerprintBytes(Multimodal.synthWavBytes(440.0, 8))
      .isEmpty)
  }

  test("audioNearDup clusters planted copies and separates distinct melodies") {
    import javax.sound.sampled.{AudioFileFormat, AudioFormat}
    val a = Multimodal.synthMelodyWav(1)
    val b = Multimodal.synthMelodyWav(9)
    val rows = Seq(
      (1L, a), // family A original
      (2L, transcode(
        a, AudioFormat.Encoding.PCM_SIGNED, AudioFileFormat.Type.AIFF)),
      (3L, Multimodal.synthMelodyWav(1, amplitude = 0.3)), // gain copy
      (4L, Multimodal.synthMelodyWav(1, rate = 11025f)), // resampled
      (10L, b), // family B original
      (11L, transcode(
        b, AudioFormat.Encoding.ULAW, AudioFileFormat.Type.WAVE)),
      (20L, Multimodal.synthMelodyWav(22)), // singleton
      (30L, "corrupt".getBytes("UTF-8"))) // quarantined
    val assets = rows
      .toDF("id", "data")
      .select(
        col("id"),
        col("data"),
        struct(lit("audio").as("modality"), lit(0L).as("n_bytes"),
          lit(0).as("width"), lit(0).as("height")).as("meta"))
    val got = Multimodal
      .audioNearDup(assets)
      .select("id", "component", "canonical")
      .as[(Long, Long, Boolean)]
      .collect()
      .map(r => r._1 -> ((r._2, r._3)))
      .toMap
    // corrupt row is absent; every decodable asset present
    assert(got.keySet === Set(1L, 2L, 3L, 4L, 10L, 11L, 20L))
    // family A clusters under min-id 1; family B under 10; 20 alone
    assert(Seq(1L, 2L, 3L, 4L).forall(id => got(id)._1 === 1L))
    assert(Seq(10L, 11L).forall(id => got(id)._1 === 10L))
    assert(got(20L)._1 === 20L)
    // exactly one canonical per component, at the min id
    assert(got.filter(_._2._2).keySet === Set(1L, 10L, 20L))
  }

  test("synthesized asset families (the q211 corpus) cluster by pattern") {
    val ids = (0L until 75L).toDF("doc_id")
    val comp = Multimodal
      .audioNearDup(Multimodal.melodyAssetsFromIds(ids, "doc_id"))
      .select("id", "component")
      .as[(Long, Long)]
      .collect()
      .toMap
    assert(comp.size === 75)
    // ids p, p+25, p+50 share melody pattern p as original / gain /
    // resampled variants — must share a component rooted at min id p
    (0L until 25L).foreach { p =>
      assert(comp(p) === p, s"pattern $p root")
      assert(comp(p + 25L) === p, s"pattern $p gain variant")
      assert(comp(p + 50L) === p, s"pattern $p resampled variant")
    }
  }
}
