package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The BI_RLE8 inter-frame codec's contract — the halves the hash
  * oracle cannot check directly: bit-exact lossless round-trip of
  * every decoded frame, REAL temporal dependency (skipped pixels come
  * from the previous frame, so dropping a delta frame corrupts what
  * follows and a delta-coded first frame is rejected), keyframe
  * cadence, container structure (MRLE handler, BI_RLE8 strf, keyframe
  * idx1 flags on key ordinals only), and loud failure on every
  * malformed-stream shape.
  */
class RleSpec extends AnyFunSuite {

  private def rule(text: String, f: Int): IndexedSeq[Int] = {
    val bytes = text.getBytes("US-ASCII")
    (0 until Gif.FramePx).map { p =>
      val k = f * Gif.FramePx + p
      if (k < bytes.length) bytes(k) & 0xff else 0
    }
  }

  // the PRODUCTION constants, not copies — a rebuilt container must
  // exercise exactly the strf shape Rle.synth ships
  private def rebuild(frames: IndexedSeq[Array[Byte]]): Array[Byte] =
    Avi.buildContainer(frames, "MRLE", Rle.BiRle8, 8, Rle.GrayPalette,
      _ % Rle.KeyInterval == 0)

  // 300 bytes → 5 frames; consecutive frames differ on every in-text
  // pixel (the +7·64 mod 26 step is nonzero), tail pixels are 0
  private val text = (0 until 300).map(i => ('a' + (i * 7) % 26).toChar).mkString

  test("container structure: RIFF/MRLE/BI_RLE8, keyframe idx1 flags on key ordinals only") {
    val avi = Rle.synth(text)
    assert(new String(avi.slice(0, 4)) === "RIFF")
    assert(new String(avi.slice(8, 12)) === "AVI ")
    val s = new String(avi, "ISO-8859-1")
    assert(s.contains("hdrl") && s.contains("vids") && s.contains("MRLE"))
    assert(s.contains("movi") && s.contains("00dc") && s.contains("idx1"))
    // strf: biCompression = 1 (BI_RLE8), biBitCount = 8, 256-entry palette
    val strf = s.indexOf("strf") + 8
    assert((avi(strf + 14) & 0xff) === 8, "biBitCount")
    assert((avi(strf + 16) & 0xff) === 1, "biCompression BI_RLE8")
    // idx1: AVIIF_KEYFRAME only on key ordinals
    val idx = s.indexOf("idx1") + 8
    def flags(f: Int): Int = avi(idx + 16 * f + 4) & 0xff
    assert(flags(0) === 0x10, "frame 0 must be flagged keyframe")
    (1 until 5).foreach(f => assert(flags(f) === 0, s"frame $f must be a delta frame"))
  }

  test("lossless inter-frame round-trip: every decoded frame equals the rule bit-exactly") {
    val frames = Rle.decodeAll(Rle.synth(text))
    assert(frames.length === 5)
    frames.zipWithIndex.foreach { case (cv, f) =>
      assert(cv.toSeq === rule(text, f), s"frame $f")
    }
  }

  test("delta frames are partial and n_px_written is the exact Hamming distance") {
    // frame 1 differs from frame 0 on exactly every 8th byte
    val t = ("abcdefgh" * 8) + ("abcdefgX" * 8)
    val fr = Rle.parseSampled(Rle.synth(t), stride = 1)
    assert(fr.map(_.frameIdx) === Seq(0, 1))
    assert(fr(0).nPxWritten === Gif.FramePx, "keyframe writes every pixel")
    val ham = rule(t, 0).zip(rule(t, 1)).count { case (a, b) => a != b }
    assert(ham === 8)
    assert(fr(1).nPxWritten === ham, "delta frame writes exactly the changed pixels")
  }

  test("skip opcodes really appear: vertical delta over unchanged bottom rows, EOL, horizontal delta") {
    // frame 1 changes only the TOP half (image rows 0-1): in BOTTOM-UP
    // storage the unchanged image-bottom rows are RLE rows 0-1, so the
    // encoder must open with a vertical delta move (0,2,0,dy); the
    // unchanged 4-byte gap inside image row 1 forces a horizontal one
    val t = "B" * 64 + ("C" * 20 + "B" * 4 + "C" * 8 + "B" * 32)
    val pl = Avi.readPayload(Rle.synth(t))
    val delta = pl.frames(1)
    assert(delta(0) === 0 && delta(1) === 2 && delta(2) === 0 && delta(3) === 2,
      "delta frame must open with a vertical move over the unchanged bottom rows")
    // the unchanged 4-byte gap inside image row 1 forces a horizontal
    // delta (0,2,dx,0) somewhere in the stream
    val ops = delta.sliding(4).exists(w =>
      w(0) == 0 && w(1) == 2 && (w(2) & 0xff) > 0 && w(3) == 0)
    assert(ops, "expected a horizontal delta move inside the changed row")
    // and the decode still round-trips bit-exactly
    Rle.decodeAll(Rle.synth(t)).zipWithIndex.foreach { case (cv, f) =>
      assert(cv.toSeq === rule(t, f), s"frame $f")
    }
  }

  test("keyframe cadence: frame 8 fully recodes even when nothing changed") {
    val t = "q" * (64 * 9) // 9 byte-identical frames
    val fr = Rle.parseSampled(Rle.synth(t), stride = 1)
    assert(fr.size === 9)
    assert(fr(0).nPxWritten === 64 && fr(8).nPxWritten === 64)
    (1 to 7).foreach(f => assert(fr(f).nPxWritten === 0,
      s"identical delta frame $f must write nothing"))
    fr.foreach(f => assert(f.pxSum === 64L * 'q'.toInt))
  }

  test("temporal dependency is REAL: dropping a delta frame corrupts the frames after it") {
    // frame 2 leaves its first 32 pixels unchanged from frame 1; with
    // frame 1 dropped those pixels inherit frame 0's values instead —
    // an intra-only (stateless) walk would not notice
    val t = "A" * 64 + "B" * 64 + ("B" * 32 + "C" * 32)
    val pl = Avi.readPayload(Rle.synth(t))
    val decoded = Rle.decodeAll(rebuild(pl.frames.patch(1, Nil, 1)))
    assert(decoded(1).toSeq !== rule(t, 2),
      "decoding frame 2's deltas on frame 0's canvas must diverge")
    // and the intact stream is bit-exact
    assert(Rle.decodeAll(Rle.synth(t))(2).toSeq === rule(t, 2))
  }

  test("keyframe seek ≡ sequential decode for EVERY frame, with the bounded cost") {
    val t = (0 until 64 * 10).map(i => ('a' + (i * 11) % 26).toChar).mkString // 10 frames
    val avi = Rle.synth(t)
    val sequential = Rle.decodeAll(avi)
    (0 until 10).foreach { f =>
      val (cv, dec) = Rle.decodeSeek(avi, f)
      assert(cv.toSeq === sequential(f).toSeq, s"seek($f) pixels")
      assert(dec === f % Rle.KeyInterval + 1, s"seek($f) cost")
      assert(dec <= Rle.KeyInterval)
    }
  }

  test("seek REALLY skips: with every pre-keyframe frame corrupted, seek works, sequential fails") {
    val t = (0 until 64 * 10).map(i => ('a' + (i * 11) % 26).toChar).mkString // keyframes 0, 8
    val pl = Avi.readPayload(Rle.synth(t))
    // clobber frames 0-7 (everything before the second keyframe) with
    // an opcode stream that fails loudly if ever decoded
    val garbage: Array[Byte] = Array(17, 65, 0, 1) // run past the row end
    val broken = rebuild(pl.frames.zipWithIndex.map {
      case (fr, f) => if (f < Rle.KeyInterval) garbage else fr
    })
    intercept[IllegalArgumentException](Rle.decodeAll(broken))
    val (cv, dec) = Rle.decodeSeek(broken, 9)
    assert(dec === 2, "frames 8 and 9 only")
    assert(cv.toSeq === rule(t, 9), "seek must decode frame 9 from keyframe 8 alone")
  }

  test("an idx1 index that lies fails loudly: a delta frame flagged as keyframe") {
    // frame 1 changes only its second half: a PARTIAL delta frame
    val t = "A" * 64 + ("A" * 32 + "B" * 32)
    val pl = Avi.readPayload(Rle.synth(t))
    // rebuild claiming EVERY frame is a keyframe: seeking to frame 1
    // lands on the delta frame, which cannot self-contain
    val lying = Avi.buildContainer(pl.frames, "MRLE", Rle.BiRle8, 8,
      Rle.GrayPalette, _ => true)
    intercept[IllegalArgumentException](Rle.decodeSeek(lying, 1))
    // and out-of-range targets are rejected
    intercept[IllegalArgumentException](Rle.decodeSeek(Rle.synth(t), 99))
  }

  test("malformed streams fail loudly, never silently") {
    intercept[IllegalArgumentException](Rle.synth("café"))
    intercept[IllegalArgumentException](Rle.synth(""))
    val avi = Rle.synth(text)
    val pl = Avi.readPayload(avi)
    // truncated opcode stream (end-of-bitmap chopped off)
    intercept[IllegalArgumentException](
      Rle.decodeAll(rebuild(pl.frames.updated(0, pl.frames(0).dropRight(2)))))
    // trailing bytes after end-of-bitmap
    intercept[IllegalArgumentException](
      Rle.decodeAll(rebuild(pl.frames.updated(0, pl.frames(0) ++ Array[Byte](3, 3)))))
    // a run past the row end (len 17 on a 16-wide row)
    intercept[IllegalArgumentException](
      Rle.decodeAll(rebuild(IndexedSeq(Array[Byte](17, 65, 0, 1)))))
    // a first frame that is delta-coded (does not cover the canvas)
    intercept[IllegalArgumentException](
      Rle.decodeAll(rebuild(IndexedSeq(Array[Byte](1, 65, 0, 1)))))
    // strf lies about the codec: biCompression flipped to BI_RGB
    val lied = avi.clone()
    val comp = new String(avi, "ISO-8859-1").indexOf("strf") + 8 + 16
    lied(comp) = 0
    intercept[IllegalArgumentException](Rle.decodeAll(lied))
    // header/stream frame-count cross-check is shared with the MJPEG
    // walk (Avi.readPayload) — AviSpec pins it; spot-check here too
    val liedCount = avi.clone()
    val avihOff = new String(avi, "ISO-8859-1").indexOf("avih") + 8
    liedCount(avihOff + 16) = 99
    intercept[IllegalArgumentException](Rle.decodeAll(liedCount))
  }

  test("delta coding does real work corpus-wide at BOTH verify-gate SFs") {
    import org.apache.spark.sql.functions._
    val spark = TestSpark.spark
    // the oracle recomputes n_px_written arithmetically; pin here that
    // the ENCODER side is genuinely inter-frame on the real corpus —
    // sampled delta frames exist and write strictly fewer than 64
    // pixels somewhere (were the encoder secretly intra-only, every
    // row would read 64 and the hash gate could not tell a keyframe
    // cadence bug from real deltas)
    Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1").foreach { sf =>
      val docs = graft.sources.Tables.documents(spark, sf)
        .select(col("doc_id"), col("text")).filter(length(col("text")) > 0)
      val rows = Rle.features(spark, docs).collect()
      assert(rows.nonEmpty)
      val deltas = rows.filter(_.frame_idx % Rle.KeyInterval != 0)
      assert(deltas.nonEmpty, s"$sf: no sampled delta frames")
      assert(deltas.exists(_.n_px_written < Gif.FramePx),
        s"$sf: every delta frame wrote the full canvas")
      rows.filter(_.frame_idx % Rle.KeyInterval == 0).foreach(r =>
        assert(r.n_px_written === Gif.FramePx,
          s"$sf doc ${r.doc_id}: keyframe wrote ${r.n_px_written}"))
    }
  }
}
