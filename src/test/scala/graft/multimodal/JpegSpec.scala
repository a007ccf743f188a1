package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The JPEG codec path's contract — the quantitative half the
  * hash-oracle cannot check (lossy pixels): real FFD8 container,
  * genuinely lossy (MAE strictly positive somewhere — a byte
  * passthrough impostor fails), fidelity bounded everywhere
  * (MAE < Jpeg.MaeBound — a wrong-geometry decode fails), exact
  * structural round-trip.
  */
class JpegSpec extends AnyFunSuite {

  test("synth emits a real JPEG container (SOI/EOI markers, JFIF header)") {
    val jpg = Jpeg.synth("abcdefghijklmnopqrstuvwxyz")
    assert((jpg(0) & 0xff) === 0xff && (jpg(1) & 0xff) === 0xd8) // SOI
    assert((jpg(jpg.length - 2) & 0xff) === 0xff && (jpg(jpg.length - 1) & 0xff) === 0xd9) // EOI
    assert(new String(jpg.slice(6, 10)) === "JFIF")
  }

  test("structure round-trips exactly; fidelity is bounded") {
    val text = "abcdefghijklmnopqrstuvwxyzABCDE" // 31 bytes → 10×4 canvas
    val m = Jpeg.parse(Jpeg.synth(text), text)
    assert(m.width === 10)
    assert(m.height === 4)
    assert(m.nPx === 40L)
    assert(m.mae < Jpeg.MaeBound)
  }

  test("the codec is genuinely lossy and everywhere within the bound at BOTH verify-gate SFs") {
    import org.apache.spark.sql.functions._
    val spark = TestSpark.spark
    // the q_jpeg_features oracle hardcodes decode_ok = TRUE, so the
    // hash gate holds only while EVERY document's MAE stays under the
    // bound with the running JDK's quantization tables — pin the
    // corpus-wide bound at every SF the verify ritual gates on, so a
    // JDK codec change or a new corpus shows up as THIS spec failing
    // rather than an opaque oracle hash mismatch
    Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1").foreach { sf =>
      val docs = graft.sources.Tables.documents(spark, sf)
        .select(col("doc_id"), col("text")).filter(length(col("text")) > 0)
      val maes = Jpeg.maeFrame(spark, docs).collect()
      assert(maes.nonEmpty)
      maes.foreach(r => assert(r.mae < Jpeg.MaeBound, s"$sf doc ${r.doc_id}: mae ${r.mae}"))
      // lossy: byte-noise text images cannot round-trip exactly — if
      // every MAE were 0 the "codec" would be a passthrough
      assert(maes.count(_.mae > 0.0) > maes.length / 2, sf)
    }
  }

  test("malformed containers fail loudly") {
    intercept[IllegalArgumentException](Jpeg.parse("not a jpeg".getBytes, "not a jpeg"))
    intercept[IllegalArgumentException](Jpeg.synth("café"))
    // truncating the scan data must fail the decode, not alias
    val jpg = Jpeg.synth("the quick brown fox jumps over the lazy dog repeatedly")
    intercept[Exception](Jpeg.parse(jpg.take(jpg.length / 2), "x"))
  }
}
