package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** The multi-stream A/V demux contract — the halves the hash oracle
  * cannot check directly: genuine two-stream container structure
  * (dwStreams = 2, auds strl with a PCM WAVEFORMATEX, time-ordered
  * interleave in movi, idx1 covering both streams), exact PCM16
  * round-trip per block, A/V pairing, single-stream rejection, torn
  * samples and format lies failing loudly — and that the seeking
  * video decoder still works on a demuxed container (idx1 audio
  * entries must not pollute the video keyframe index).
  */
class DemuxSpec extends AnyFunSuite {

  private val text = (0 until 200).map(i => ('a' + (i * 5) % 26).toChar).mkString // 4 frames

  test("two-stream container: dwStreams=2, auds strl, time-ordered 00dc/01wb interleave") {
    val avi = Demux.synth(text)
    val s = new String(avi, "ISO-8859-1")
    assert(s.contains("vids") && s.contains("MRLE") && s.contains("auds"))
    // avih dwStreams (7th u32 of the payload) = 2
    val avih = s.indexOf("avih") + 8
    assert((avi(avih + 24) & 0xff) === 2, "dwStreams")
    // inside movi, chunks must alternate video, audio, video, audio…
    val movi = s.indexOf("movi")
    val idx1 = s.indexOf("idx1")
    val ids = Iterator.iterate(s.indexOf("00dc", movi)) { i =>
      val both = Seq(s.indexOf("00dc", i + 1), s.indexOf("01wb", i + 1))
        .filter(j => j >= 0 && j < idx1)
      if (both.isEmpty) -1 else both.min
    }.takeWhile(_ >= 0).map(i => s.substring(i, i + 4)).toSeq
    assert(ids.size === 8, "4 frames → 8 interleaved chunks")
    assert(ids === Seq("00dc", "01wb", "00dc", "01wb", "00dc", "01wb", "00dc", "01wb"))
  }

  test("lossless demux: video pixels AND audio samples round-trip exactly, per frame") {
    val bytes = text.getBytes("US-ASCII")
    val frames = Demux.parse(Demux.synth(text))
    assert(frames.map(_.frameIdx) === Seq(0, 1, 2, 3))
    frames.foreach { fr =>
      val lo = fr.frameIdx * Gif.FramePx
      val hi = math.min(lo + Gif.FramePx, bytes.length)
      val px = (0 until Gif.FramePx).map { p =>
        if (lo + p < bytes.length) bytes(lo + p) & 0xff else 0
      }
      val smp = (lo until hi).map(i => ((bytes(i) & 0xff) - 96) * 256)
      assert(fr.pxSum === px.map(_.toLong).sum, s"frame ${fr.frameIdx} video")
      assert(fr.audioN === smp.size, s"frame ${fr.frameIdx} sample count")
      assert(fr.audioSum === smp.map(_.toLong).sum, s"frame ${fr.frameIdx} audio sum")
      assert(fr.audioPeak === smp.map(math.abs).max, s"frame ${fr.frameIdx} peak")
    }
  }

  test("stream formats are selected by strh fccType, not strl position: audio-first hdrl demuxes identically") {
    val bytes = Rle.checkedBytes(text)
    val video = Rle.encodeStream(bytes)
    val audio = IndexedSeq.tabulate(video.length) { f =>
      val lo = f * Gif.FramePx
      val hi = math.min(lo + Gif.FramePx, bytes.length)
      val b = java.nio.ByteBuffer.allocate((hi - lo) * 2)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      (lo until hi).foreach(i => b.putShort((((bytes(i) & 0xff) - 96) * 256).toShort))
      b.array()
    }
    def build(audioFirst: Boolean) = Avi.buildContainer(video, handler = "MRLE",
      compression = Rle.BiRle8, bitCount = 8, palette = Rle.GrayPalette,
      isKey = _ % Rle.KeyInterval == 0, audio = audio, audioFirst = audioFirst)
    // the audio-first container must parse to the SAME frames — a
    // position-based header reader would validate the WAVEFORMATEX as
    // a BITMAPINFOHEADER and fail (the round-16 advice scenario)
    assert(Demux.parse(build(audioFirst = true)) === Demux.parse(build(audioFirst = false)))
  }

  test("the video keyframe index survives the interleave: seek works on a demuxed container") {
    // idx1 now carries 01wb entries too (always key-flagged); the
    // walk must filter them out of the VIDEO keyframe index or
    // decodeSeek would land on an audio ordinal
    val t = (0 until 64 * 10).map(i => ('a' + (i * 11) % 26).toChar).mkString
    val avi = Demux.synth(t)
    val sequential = Rle.decodeAll(avi)
    val (cv, dec) = Rle.decodeSeek(avi, 9)
    assert(cv.toSeq === sequential(9).toSeq)
    assert(dec === 2, "keyframe 8 + frame 9")
  }

  test("a single-stream container is rejected, as are torn samples and format lies") {
    // Rle.synth builds the same video with NO audio stream
    intercept[IllegalArgumentException](Demux.parse(Rle.synth(text)))
    val avi = Demux.synth(text)
    // torn PCM16 sample: declare an odd-length audio chunk
    val s = new String(avi, "ISO-8859-1")
    val torn = avi.clone()
    val a0 = s.indexOf("01wb") + 4 // size field
    val b = java.nio.ByteBuffer.wrap(torn).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.putInt(a0, b.getInt(a0) - 1)
    intercept[IllegalArgumentException](Demux.parse(torn))
    // WAVEFORMATEX lies: flip wFormatTag away from PCM
    val lied = avi.clone()
    val strf2 = s.indexOf("strf", s.indexOf("auds")) + 8
    lied(strf2) = 2
    intercept[IllegalArgumentException](Demux.parse(lied))
  }
}
