package graft.multimodal

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property fuzz for the two HAND-ROLLED byte walkers (the codecs the
  * JDK does not decode for us, so every offset/stride/endianness line
  * is ours): for arbitrary ASCII texts the synth→parse round-trip
  * must reproduce the rule-computed features exactly — padding
  * strides, bottom-up rows, BGR order, one-byte tails, widths that
  * land exactly on and just past row boundaries.
  */
class ByteWalkerPropertiesSpec extends AnyFunSuite {

  private def samples[A](gen: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => gen.apply(Gen.Parameters.default, Seed(1201L + i)))

  // lengths hugging the structural boundaries: multiples of the BMP
  // row (30 bytes = 10 px × 3) and the 3-byte pixel, ±1
  private val textGen: Gen[String] = for {
    base <- Gen.choose(1, 400)
    nudge <- Gen.oneOf(-1, 0, 1)
    len = math.max(1, base + nudge)
    toks <- Gen.listOfN(len, Gen.choose(32, 126))
  } yield toks.map(_.toChar).mkString

  test("WAV: synth→parse reproduces the sample rule for arbitrary texts") {
    samples(textGen, 150).foreach { t =>
      val bytes = t.getBytes("US-ASCII")
      val smp = bytes.map(b => ((b & 0xff) - 96) * 256)
      val m = Wav.parse(Wav.synth(t))
      assert(m.sampleRate === Wav.SampleRate && m.channels === 1 && m.bitDepth === 16)
      assert(m.nSamples === bytes.length.toLong, s"len=${t.length}")
      assert(m.peak === smp.map(s => math.abs(s).toLong).max, s"len=${t.length}")
      val rms = math.sqrt(smp.map(s => s.toDouble * s).sum / smp.length)
      assert(math.abs(m.rms - rms) < 1e-6, s"len=${t.length}: ${m.rms} vs $rms")
    }
  }

  test("BMP: synth→parse reproduces the pixel rule for arbitrary texts") {
    samples(textGen, 150).foreach { t =>
      val bytes = t.getBytes("US-ASCII")
      def ch(i: Int): Int = if (i < bytes.length) bytes(i) & 0xff else 0
      val h = ((bytes.length + 2) / 3 + 9) / 10
      val px = (0 until h * 10).map(p => (ch(3 * p), ch(3 * p + 1), ch(3 * p + 2)))
      val m = Bmp.parse(Bmp.synth(t))
      assert(m.width === 10 && m.height === h, s"len=${t.length}")
      assert(m.nPx === px.size.toLong)
      assert(m.sumR === px.map(_._1.toLong).sum, s"len=${t.length} R")
      assert(m.sumG === px.map(_._2.toLong).sum, s"len=${t.length} G")
      assert(m.sumB === px.map(_._3.toLong).sum, s"len=${t.length} B")
      assert(m.topRowSum === px.take(10).map(c => (c._1 + c._2 + c._3).toLong).sum,
        s"len=${t.length} top row (bottom-up reconstruction)")
      assert(m.lumaSum === px.map(c => 299L * c._1 + 587L * c._2 + 114L * c._3).sum,
        s"len=${t.length} luma")
    }
  }
}
