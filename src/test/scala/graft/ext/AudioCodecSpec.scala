package graft.ext

import org.scalatest.funsuite.AnyFunSuite

/** The q114 codec boundary in isolation: the real WAV encode→decode
  * round trip is byte-exact against the generator, format
  * certification works, and junk payloads degrade cleanly.
  */
class AudioCodecSpec extends AnyFunSuite {

  test("WAV round trip recovers every sample exactly") {
    for (d <- Seq(0L, 1L, 511L, 512L, 12345L)) {
      val (ok, samples) = JdkAudio.decodePcm16(AudioGen.wav(d))
      assert(ok, s"format certification failed for doc $d")
      assert(samples.length == AudioGen.nSamples(d))
      samples.zipWithIndex.foreach { case (v, i) =>
        assert(v == AudioGen.sample(d, i), s"sample $i of doc $d")
      }
    }
  }

  test("sample range spans the full signed 16-bit domain across docs") {
    val all = (0L until 64L).flatMap(d =>
      (0 until AudioGen.nSamples(d)).map(i => AudioGen.sample(d, i)))
    assert(all.min < -30000 && all.max > 30000)
    assert(all.forall(v => v >= -32768 && v <= 32767))
  }

  test("junk payloads degrade to (false, empty), not an exception") {
    assert(JdkAudio.decodePcm16("not a wav".getBytes) == ((false, Array.empty[Int]))
      || JdkAudio.decodePcm16("not a wav".getBytes)._1 == false)
    val (ok, samples) = JdkAudio.decodePcm16(Array[Byte](1, 2, 3))
    assert(!ok && samples.isEmpty)
  }
}
