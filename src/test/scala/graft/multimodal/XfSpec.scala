package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The transform codec's contract — the halves the hash oracle cannot
  * check directly: EXACT losslessness at Q=1 (the integer WHT really
  * inverts), the Q=8 per-pixel error bound, energy compaction (flat
  * content quantizes to zero ACs — the property transforms exist
  * for), container structure (GWT1, all frames key-flagged), and
  * loud failure on malformed payloads and format lies.
  */
class XfSpec extends AnyFunSuite {

  import Gif.FramePx

  private def rule(text: String, f: Int): IndexedSeq[Int] = {
    val bytes = text.getBytes("US-ASCII")
    (0 until FramePx).map { p =>
      val k = f * FramePx + p
      if (k < bytes.length) bytes(k) & 0xff else 0
    }
  }

  private val text = (0 until 300).map(i => ('a' + (i * 7) % 26).toChar).mkString

  test("container structure: RIFF/GWT1 strf, every frame key-flagged (intra codec)") {
    val avi = Xf.synth(text)
    val s = new String(avi, "ISO-8859-1")
    assert(s.contains("hdrl") && s.contains("vids") && s.contains("GWT1"))
    val strf = s.indexOf("strf") + 8
    assert(new String(avi.slice(strf + 16, strf + 20), "US-ASCII") === "GWT1")
    val idx = s.indexOf("idx1") + 8
    (0 until 5).foreach(f =>
      assert((avi(idx + 16 * f + 4) & 0xff) === 0x10, s"frame $f must be key"))
  }

  test("Q=1 is EXACTLY lossless: the integer transform inverts bit-for-bit") {
    val frames = Xf.decodeAll(Xf.synth(text, q = 1), q = 1)
    assert(frames.length === 5)
    frames.zipWithIndex.foreach { case (fr, f) =>
      assert(fr.pixels.toSeq === rule(text, f), s"frame $f")
    }
  }

  test("Q=8 is honestly lossy within the provable per-pixel bound") {
    val frames = Xf.decodeAll(Xf.synth(text))
    var anyLoss = false
    frames.zipWithIndex.foreach { case (fr, f) =>
      val src = rule(text, f)
      (0 until FramePx).foreach { p =>
        val err = math.abs(fr.pixels(p) - src(p))
        // 4 coefficients, each off by ≤ Q/2 after quantization, divided
        // back by 4 with rounding: |err| ≤ Q/2 + 1
        assert(err <= Xf.Quant / 2 + 1, s"frame $f pixel $p err $err")
        if (err > 0) anyLoss = true
      }
    }
    assert(anyLoss, "Q=8 never lost a pixel — quantization is not happening")
  }

  test("energy compaction: flat content quantizes to zero AC coefficients") {
    // 128 identical bytes → two fully-flat frames: all 16 blocks per
    // frame carry DC only
    val frames = Xf.decodeAll(Xf.synth("q" * 128))
    assert(frames.length === 2)
    frames.foreach(fr => assert(fr.nNzAc === 0))
    // and the DC-only reconstruction is still within the bound
    frames.foreach(fr =>
      fr.pixels.foreach(v => assert(math.abs(v - 'q'.toInt) <= Xf.Quant / 2 + 1)))
  }

  test("malformed payloads and format lies fail loudly") {
    // a frame that is not exactly 16×4 int16 coefficients
    val bad = Avi.buildContainer(IndexedSeq(new Array[Byte](127)), "GWT1",
      Xf.XfComp, 8, Rle.GrayPalette, _ => true)
    assert(intercept[IllegalArgumentException](Xf.decodeAll(bad))
      .getMessage.contains("expected 128"))
    // an MRLE container handed to the GWT1 decoder
    assert(intercept[IllegalArgumentException](Xf.decodeAll(Rle.synth(text)))
      .getMessage.contains("not GWT1"))
  }

  test("Rice arm: entropy layer is lossless over the quantized coefficients, and it COMPRESSES") {
    val plain = Xf.decodeAll(Xf.synth(text))
    val rice = Xf.riceDecodeAll(Xf.riceSynth(text))
    assert(rice.length === plain.length)
    rice.zip(plain).zipWithIndex.foreach { case ((r, p), f) =>
      assert(r.pixels.toSeq === p.pixels.toSeq,
        s"frame $f: entropy coding must not change reconstruction")
      assert(r.nBits < 64 * 16, s"frame $f: ${r.nBits} bits ≥ raw 16-bit coding")
    }
    // and at Q=1 the whole chain (transform + entropy) is lossless
    Xf.riceDecodeAll(Xf.riceSynth(text, q = 1), q = 1).zipWithIndex.foreach {
      case (fr, f) => assert(fr.pixels.toSeq === rule(text, f), s"frame $f (Q=1)")
    }
  }

  test("Rice bitstream damage fails loudly: truncation, trailing data, nonzero padding") {
    val pl = Avi.readPayload(Xf.riceSynth(text))
    def rebuild(frames: IndexedSeq[Array[Byte]]): Array[Byte] =
      Avi.buildContainer(frames, "GWR1", Xf.RiceComp, 8, Rle.GrayPalette, _ => true)
    // truncated: drop the last byte → the 64th code runs out of bits
    val cut = pl.frames.updated(0, pl.frames(0).dropRight(1))
    assert(intercept[IllegalArgumentException](Xf.riceDecodeAll(rebuild(cut)))
      .getMessage.contains("exhausted"))
    // a whole trailing byte after the last code
    val extra = pl.frames.updated(0, pl.frames(0) :+ 0.toByte)
    assert(intercept[IllegalArgumentException](Xf.riceDecodeAll(rebuild(extra)))
      .getMessage.contains("trailing"))
    // nonzero padding bits inside the last byte
    val mangled = pl.frames(0).clone()
    mangled(mangled.length - 1) = (mangled(mangled.length - 1) | 1).toByte
    val bad = pl.frames.updated(0, mangled)
    val e = intercept[IllegalArgumentException](Xf.riceDecodeAll(rebuild(bad)))
    assert(e.getMessage.contains("padding") || e.getMessage.contains("trailing") ||
      e.getMessage.contains("exhausted"))
  }

  test("rate and distortion are real corpus-wide at BOTH verify-gate SFs") {
    import org.apache.spark.sql.functions._
    val spark = TestSpark.spark
    Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1").foreach { sf =>
      val docs = graft.sources.Tables.documents(spark, sf)
        .select(col("doc_id"), col("text")).filter(length(col("text")) > 0)
      val rows = Xf.features(spark, docs).collect()
      assert(rows.nonEmpty)
      assert(rows.exists(_.n_nz_ac > 0), s"$sf: no AC energy anywhere")
      assert(rows.exists(_.sad > 0), s"$sf: the lossy operating point lost nothing")
      rows.foreach(r => assert(r.sad <= FramePx.toLong * (Xf.Quant / 2 + 1),
        s"$sf doc ${r.doc_id} frame ${r.frame_idx}: sad ${r.sad} out of bound"))
    }
  }
}
