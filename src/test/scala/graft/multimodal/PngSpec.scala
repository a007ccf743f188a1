package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The PNG codec path's contract: real deflate-compressed container,
  * exact lossless round-trip, image-space feature semantics, and
  * cross-codec agreement with the BMP twin (identical pixel rule ⇒
  * identical luma sums).
  */
class PngSpec extends AnyFunSuite {

  test("synth emits a real PNG container (magic + it is not the raw pixels)") {
    val png = Png.synth("abcdefghijklmnopqrstuvwxyz")
    assert((png(0) & 0xff) === 0x89)
    assert(new String(png.slice(1, 4)) === "PNG")
    // a real encoder writes IHDR/IDAT/IEND chunk names
    val s = new String(png.map(b => (b & 0xff).toChar))
    assert(s.contains("IHDR") && s.contains("IDAT") && s.contains("IEND"))
  }

  test("synth → parse round-trips dimensions and exact feature arithmetic") {
    // 3 chars → 1 pixel used + 9 zero pixels on a 10×1 canvas
    val m = Png.parse(Png.synth("abc"))
    assert(m.width === 10)
    assert(m.height === 1)
    assert(m.nPx === 10L)
    assert((m.sumR, m.sumG, m.sumB) === ((97L, 98L, 99L)))
    assert(m.col0Sum === 97L + 98 + 99)      // only pixel 0 is in column 0
    assert(m.bottomRowSum === 97L + 98 + 99) // height 1: bottom row == the row
    assert(m.lumaMax === 299L * 97 + 587L * 98 + 114L * 99)
    assert(m.lumaSum === m.lumaMax) // all other pixels are zero
  }

  test("row/column semantics: col0 walks rows, bottom row is the LAST image row") {
    // 31 chars → 11 pixels → height 2 on the 10-wide canvas
    val text = "abcdefghijklmnopqrstuvwxyzABCDE"
    val m = Png.parse(Png.synth(text))
    assert(m.height === 2)
    val bytes = text.map(_.toInt)
    // column 0 = pixels 0 and 10 → bytes 0..2 and 30 (31..32 are 0)
    assert(m.col0Sum === (bytes.take(3).sum + bytes(30)).toLong)
    // bottom row = pixels 10..19 → byte 30 plus zeros
    assert(m.bottomRowSum === bytes(30).toLong)
  }

  test("decode is REAL: corrupting the deflate stream fails, not aliases") {
    val png = Png.synth("the quick brown fox jumps over the lazy dog")
    // flip bytes in the middle of the IDAT payload — zlib/CRC must notice
    val corrupt = png.clone()
    val idat = new String(corrupt.map(b => (b & 0xff).toChar)).indexOf("IDAT")
    for (i <- idat + 8 to idat + 12) corrupt(i) = (corrupt(i) ^ 0x5a).toByte
    intercept[Exception](Png.parse(corrupt))
    // and a non-PNG container is rejected by the magic guard
    intercept[IllegalArgumentException](Png.parse("not a png at all".getBytes))
    intercept[IllegalArgumentException](Png.synth("café"))
  }

  test("cross-codec: PNG and BMP decode the same pixel rule to the same luma") {
    import org.apache.spark.sql.functions._
    val spark = TestSpark.spark
    val docs = graft.sources.Tables.documents(spark, TestSpark.Sf)
      .select(col("doc_id"), col("text")).filter(length(col("text")) > 0)
    val png = Png.features(spark, docs).toDF().select(col("doc_id"), col("luma_sum"))
    val bmp = Bmp.features(spark, docs).toDF()
      .select(col("doc_id"), col("luma_sum").as("bmp_luma"))
    val diverged = png.join(bmp, "doc_id")
      .filter(col("luma_sum") =!= col("bmp_luma")).count()
    assert(diverged === 0L)
  }
}
