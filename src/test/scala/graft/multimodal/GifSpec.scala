package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** The real multi-frame GIF codec round-trip: frame count/order,
  * lossless gray values, sampling stride, corrupted-stream failure.
  */
class GifSpec extends AnyFunSuite {

  test("round-trip: container frame count, frame ORDER, and lossless pixel values") {
    // 150 ASCII bytes → ceil(150/64) = 3 frames; stride 1 reads all
    val text = (0 until 150).map(i => ('a' + i % 26).toChar).mkString
    val gif = Gif.synth(text)
    assert(gif.length >= 6 && new String(gif.take(3), "US-ASCII") === "GIF")
    val frames = Gif.parseSampled(gif, stride = 1)
    assert(frames.map(_.frameIdx) === Seq(0, 1, 2), "frames must come back in stream order")
    assert(frames.forall(_.nFrames === 3))
    // exact text-derived truth per frame — GIF's indexed LZW is
    // lossless, so sums/maxes must be EQUAL, not approximate
    val bytes = text.getBytes("US-ASCII")
    frames.foreach { fr =>
      val vals = (0 until Gif.FramePx).map { p =>
        val k = fr.frameIdx * Gif.FramePx + p
        if (k < bytes.length) bytes(k) & 0xff else 0
      }
      assert(fr.pxSum === vals.map(_.toLong).sum, s"frame ${fr.frameIdx} sum")
      assert(fr.pxMax === vals.max, s"frame ${fr.frameIdx} max")
    }
  }

  test("sampling stride: every 3rd frame, ordinals true to the container") {
    val text = "x" * (64 * 7 + 5) // 8 frames
    val frames = Gif.parseSampled(Gif.synth(text))
    assert(frames.map(_.frameIdx) === Seq(0, 3, 6))
    assert(frames.forall(_.nFrames === 8))
  }

  test("a corrupted LZW stream fails loudly, never silently") {
    val gif = Gif.synth("hello world, this is a frame payload that spans enough bytes")
    // zero out a span in the compressed body (past the 13-byte header
    // + palette) — the reader must throw, not return garbage frames
    val corrupted = gif.clone()
    val start = 13 + 768 + 10 // header + 256-entry palette + a margin
    (start until math.min(start + 24, corrupted.length)).foreach(corrupted(_) = 0)
    // loud = the reader throws, OR (if it tolerates the stream) the
    // decoded pixels differ from the clean decode so the hash gate
    // catches it — what must NEVER happen is an identical result
    val truth = Gif.parseSampled(gif, stride = 1)
    val silent = scala.util.Try(Gif.parseSampled(corrupted, stride = 1))
      .toOption.exists(_ == truth)
    assert(!silent, "corruption neither threw nor changed decoded pixels")
  }

  test("non-GIF bytes and non-ASCII synth input are rejected") {
    intercept[IllegalArgumentException](Gif.parseSampled(Array[Byte](1, 2, 3, 4, 5, 6)))
    intercept[IllegalArgumentException](Gif.synth("héllo"))
    intercept[IllegalArgumentException](Gif.synth(""))
  }
}
