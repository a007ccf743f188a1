package graft.multimodal

import java.nio.{ByteBuffer, ByteOrder}

import org.scalatest.funsuite.AnyFunSuite

/** The RIFF/WAVE chunk walker's contract: exact header round-trip,
  * exact PCM stats, unknown-chunk skipping, loud failure on garbage.
  */
class WavSpec extends AnyFunSuite {

  test("synth → parse round-trips header fields and exact signal stats") {
    val m = Wav.parse(Wav.synth("abc"))
    assert(m.sampleRate === Wav.SampleRate)
    assert(m.channels === 1)
    assert(m.bitDepth === 16)
    assert(m.nSamples === 3L)
    // samples: (97-96)*256, (98-96)*256, (99-96)*256 = 256, 512, 768
    assert(m.peak === 768L)
    val sumSq = 256L * 256 + 512L * 512 + 768L * 768
    assert(m.rms === math.sqrt(sumSq.toDouble / 3))
  }

  test("parser skips unknown chunks by their declared size") {
    val base = Wav.synth("hello world")
    val ref = Wav.parse(base)
    // splice a LIST chunk between fmt (ends at byte 36) and data
    val extra = ByteBuffer.allocate(base.length + 14).order(ByteOrder.LITTLE_ENDIAN)
    extra.put(base, 0, 36)
    extra.put("LIST".getBytes).putInt(6).put("INFOxy".getBytes)
    extra.put(base, 36, base.length - 36)
    val m = Wav.parse(extra.array())
    assert(m === ref)
  }

  test("a word-aligned odd-sized unknown chunk is skipped with its pad byte") {
    val base = Wav.synth("xyz")
    val ref = Wav.parse(base)
    val extra = ByteBuffer.allocate(base.length + 8 + 5 + 1).order(ByteOrder.LITTLE_ENDIAN)
    extra.put(base, 0, 36)
    extra.put("junk".getBytes).putInt(5).put("abcde".getBytes).put(0.toByte)
    extra.put(base, 36, base.length - 36)
    assert(Wav.parse(extra.array()) === ref)
  }

  test("malformed containers fail loudly") {
    intercept[IllegalArgumentException](Wav.parse("definitely not a wav".getBytes))
    // RIFF magic but not WAVE form
    val b = Wav.synth("a"); b(8) = 'X'.toByte
    intercept[IllegalArgumentException](Wav.parse(b))
  }
}
