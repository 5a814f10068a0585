package graft
import org.scalatest.funsuite.AnyFunSuite
import graft.multimodal.Multimodal
class TmpCpuSpec extends AnyFunSuite {
  test("per-clip cpu split") {
    val clips = (0 until 75).map { i =>
      val p = i % 25; val v = i / 25
      v match {
        case 0 => Multimodal.synthMelodyWav(p)
        case 1 => Multimodal.synthMelodyWav(p, amplitude = 0.4)
        case _ => Multimodal.synthMelodyWav(p, rate = 11025f)
      }
    }
    // warm JIT
    (0 until 3000).foreach(i => Multimodal.audioFingerprintBytes(clips(i % 75)))
    val n = 5000
    var t0 = System.nanoTime()
    (0 until n).foreach(i => Multimodal.audioFingerprintBytes(clips(i % 75)))
    println(f"[cpu] full fingerprint: ${(System.nanoTime()-t0)/1e6/n}%6.4f ms/clip")
    // decode-only cost via the public decode feature path? use javax directly
    t0 = System.nanoTime()
    (0 until n).foreach { i =>
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(clips(i % 75)))
      val buf = in.readAllBytes()
      if (buf.length == 0) fail()
    }
    println(f"[cpu] decode only:      ${(System.nanoTime()-t0)/1e6/n}%6.4f ms/clip")
  }
}
