package graft.multimodal

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property fuzz for the byte-codec family: invariants that must hold
  * for ALL ASCII inputs, not just the shipped corpus or the planted
  * spec frames — codecs are exactly the code class where a rare input
  * shape (a run crossing a row boundary, an all-identical frame, a
  * one-byte tail frame) hides the off-by-one the example tests miss.
  * Deterministic manual sampling (fixed seeds, no scalacheck bridge —
  * the FunctionPropertiesSpec discipline).
  */
class CodecPropertiesSpec extends AnyFunSuite {

  private def samples[A](gen: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => gen.apply(Gen.Parameters.default, Seed(91L + i)))

  // text shapes that stress the codecs differently: uniform runs
  // (long RLE runs, zero-delta frames), high-entropy (absolute mode
  // everywhere), low-alphabet (mixed runs), and ragged lengths
  // hitting every tail-frame size including single-byte
  private val textGen: Gen[String] = for {
    kind <- Gen.choose(0, 3)
    len <- Gen.choose(1, 64 * 10 + 7)
    s <- kind match {
      case 0 => Gen.const("q" * len)
      case 1 => Gen.listOfN(len, Gen.choose(32, 126)).map(_.map(_.toChar).mkString)
      case 2 => Gen.listOfN(len, Gen.oneOf('a', 'b')).map(_.mkString)
      case 3 => Gen.choose(0, 25).map(k =>
        (0 until len).map(i => ('a' + (i * k) % 26).toChar).mkString)
    }
  } yield s

  private def rule(bytes: Array[Byte], f: Int): IndexedSeq[Int] =
    (0 until Gif.FramePx).map { p =>
      val k = f * Gif.FramePx + p
      if (k < bytes.length) bytes(k) & 0xff else 0
    }

  test("RLE round-trip is bit-exact for arbitrary ASCII texts") {
    samples(textGen, 120).foreach { t =>
      val bytes = t.getBytes("US-ASCII")
      val frames = Rle.decodeAll(Rle.synth(t))
      assert(frames.length === (bytes.length + Gif.FramePx - 1) / Gif.FramePx, s"len=${t.length}")
      frames.zipWithIndex.foreach { case (cv, f) =>
        assert(cv.toSeq === rule(bytes, f), s"len=${t.length} frame $f")
      }
    }
  }

  test("keyframe seek ≡ sequential decode at every ordinal, cost within the cadence") {
    samples(textGen, 40).foreach { t =>
      val avi = Rle.synth(t)
      val sequential = Rle.decodeAll(avi)
      sequential.indices.foreach { f =>
        val (cv, dec) = Rle.decodeSeek(avi, f)
        assert(cv.toSeq === sequential(f).toSeq, s"len=${t.length} seek($f)")
        assert(dec === f % Rle.KeyInterval + 1)
      }
    }
  }

  /** Independent replica of the MC synth rule (scroll + ticker). */
  private def mcRule(bytes: Array[Byte], f: Int): IndexedSeq[Int] = {
    val bsum = bytes.foldLeft(0L)((s, x) => s + (x & 0xff))
    (0 until Gif.FramePx).map { p =>
      if (p % Mc.OverlayMod == 0) (128L + ((bsum + f) % 64L)).toInt
      else {
        val k = f * Gif.FrameW + p
        if (k < bytes.length) bytes(k) & 0xff else 0
      }
    }
  }

  test("MC round-trip is bit-exact and the motion stats match an independent rule replica") {
    samples(textGen, 120).foreach { t =>
      val bytes = t.getBytes("US-ASCII")
      val frames = Mc.decodeAll(Mc.synth(t))
      val expectedN =
        if (bytes.length <= Gif.FramePx) 1
        else (bytes.length - Gif.FramePx + Gif.FrameW - 1) / Gif.FrameW + 1
      assert(frames.length === expectedN, s"len=${t.length}")
      frames.zipWithIndex.foreach { case ((cv, st), f) =>
        val cur = mcRule(bytes, f)
        assert(cv.toSeq === cur, s"len=${t.length} frame $f")
        if (f % Mc.KeyInterval == 0) {
          assert(st.nMv === 0 && st.nResid === 0 && st.residAbs === 0L,
            s"len=${t.length} key $f")
        } else {
          // replica of the two-candidate search, straight from the rule
          val prev = mcRule(bytes, f - 1)
          var nMv = 0; var nResid = 0; var residAbs = 0L
          (0 until 12).foreach { b =>
            val ps = (0 until 4).map(j => 4 * b + j)
            val c0 = ps.count(p => cur(p) != prev(p))
            val cS = ps.count(p => cur(p) != prev(p + Gif.FrameW))
            val s0 = ps.map(p => math.abs(cur(p) - prev(p)).toLong).sum
            val sS = ps.map(p => math.abs(cur(p) - prev(p + Gif.FrameW)).toLong).sum
            if (cS < c0) { nMv += 1; nResid += cS; residAbs += sS }
            else { nResid += c0; residAbs += s0 }
          }
          assert((st.nMv, st.nResid, st.residAbs) === ((nMv, nResid, residAbs)),
            s"len=${t.length} frame $f motion stats")
        }
      }
    }
  }

  test("MC keyframe seek ≡ sequential decode at every ordinal, cost within the cadence") {
    samples(textGen, 40).foreach { t =>
      val avi = Mc.synth(t)
      val sequential = Mc.decodeAll(avi)
      sequential.indices.foreach { f =>
        val (cv, dec) = Mc.decodeSeek(avi, f)
        assert(cv.toSeq === sequential(f)._1.toSeq, s"len=${t.length} seek($f)")
        assert(dec === f % Mc.KeyInterval + 1)
      }
    }
  }

  test("WHT transform inverts exactly at Q=1 and bounds the error at Q=8, for arbitrary texts") {
    samples(textGen, 120).foreach { t =>
      val bytes = t.getBytes("US-ASCII")
      val lossless = Xf.decodeAll(Xf.synth(t, q = 1), q = 1)
      lossless.zipWithIndex.foreach { case (fr, f) =>
        assert(fr.pixels.toSeq === rule(bytes, f), s"len=${t.length} frame $f (Q=1)")
      }
      Xf.decodeAll(Xf.synth(t)).zipWithIndex.foreach { case (fr, f) =>
        val src = rule(bytes, f)
        (0 until Gif.FramePx).foreach { p =>
          assert(math.abs(fr.pixels(p) - src(p)) <= Xf.Quant / 2 + 1,
            s"len=${t.length} frame $f pixel $p (Q=${Xf.Quant})")
        }
      }
    }
  }

  test("Rice entropy layer round-trips the quantized stream and matches the closed-form bit count") {
    samples(textGen, 80).foreach { t =>
      val bytes = t.getBytes("US-ASCII")
      val plain = Xf.decodeAll(Xf.synth(t))
      val rice = Xf.riceDecodeAll(Xf.riceSynth(t))
      rice.zip(plain).zipWithIndex.foreach { case ((r, p), f) =>
        assert(r.pixels.toSeq === p.pixels.toSeq, s"len=${t.length} frame $f")
        // independent replica of the code-length formula over the rule
        val src = rule(bytes, f)
        val expBits = (0 until 16).map { b =>
          val x = (0 until 4).map(j => src(4 * b + j))
          val c = Seq(x(0) + x(1) + x(2) + x(3), x(0) - x(1) + x(2) - x(3),
            x(0) + x(1) - x(2) - x(3), x(0) - x(1) - x(2) + x(3))
          c.map { ck =>
            val tq = (ck + 2048 + Xf.Quant / 2) / Xf.Quant
            val d = tq - Xf.RiceCenter
            val v = if (d >= 0) 2 * d else -2 * d - 1
            (v >> Xf.RiceK) + 1 + Xf.RiceK
          }.sum
        }.sum
        assert(r.nBits === expBits, s"len=${t.length} frame $f bit count")
      }
    }
  }

  test("demux round-trip: video pixels and audio samples agree with the rules per frame") {
    samples(textGen, 60).foreach { t =>
      val bytes = t.getBytes("US-ASCII")
      val frames = Demux.parse(Demux.synth(t))
      frames.foreach { fr =>
        val px = rule(bytes, fr.frameIdx)
        val lo = fr.frameIdx * Gif.FramePx
        val hi = math.min(lo + Gif.FramePx, bytes.length)
        val smp = (lo until hi).map(i => ((bytes(i) & 0xff) - 96) * 256)
        assert(fr.pxSum === px.map(_.toLong).sum, s"len=${t.length} frame ${fr.frameIdx}")
        assert(fr.audioN === smp.size && fr.audioSum === smp.map(_.toLong).sum
          && fr.audioPeak === (if (smp.isEmpty) 0 else smp.map(math.abs).max),
          s"len=${t.length} frame ${fr.frameIdx} audio")
      }
    }
  }

  test("n_px_written is the exact Hamming distance on delta frames, full on keyframes") {
    samples(textGen, 60).foreach { t =>
      val bytes = t.getBytes("US-ASCII")
      Rle.parseSampled(Rle.synth(t), stride = 1).foreach { fr =>
        val expect =
          if (fr.frameIdx % Rle.KeyInterval == 0) Gif.FramePx
          else rule(bytes, fr.frameIdx).zip(rule(bytes, fr.frameIdx - 1))
            .count { case (a, b) => a != b }
        assert(fr.nPxWritten === expect, s"len=${t.length} frame ${fr.frameIdx}")
      }
    }
  }
}
