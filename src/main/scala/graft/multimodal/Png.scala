package graft.multimodal

import java.awt.image.{BufferedImage, DataBufferByte}
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import javax.imageio.ImageIO

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** REAL PNG decode for the multimodal suite — the de-stubbed
  * COMPRESSED half of the image path. [[Bmp]] proved the raw-container
  * pattern with hand-walked bytes; PNG adds a genuine codec (zlib
  * deflate, scanline filters) which the JDK's built-in `javax.imageio`
  * decodes natively (PNG ships in `java.desktop`, headless-safe, no
  * external library), so the remaining stub boundary in [[Blob]] is
  * now only formats the JDK cannot decode (H.264-class video).
  *
  * Synthesis is deterministic from the text corpus and IDENTICAL to
  * [[Bmp]]'s pixel rule: pixel p (row-major, top-left origin) has
  * R = byte 3p, G = byte 3p+1, B = byte 3p+2 of the document text
  * (0 beyond the end) on a fixed [[Bmp.Width]]-wide canvas — so the
  * two image queries are cross-codec twins (PngSpec pins
  * `luma_sum(png) == luma_sum(bmp)` per document) while the FEATURE
  * set here is chosen to catch the decode bugs the means alone would
  * miss: `col0_sum` (image-space first column — catches an x/y
  * transpose), `bottom_row_sum` (catches a row-order flip; the BMP
  * twin pins the TOP row), `luma_max` (an order statistic — catches
  * any single corrupted pixel that sums could mask).
  *
  * 100 TB shape: encode and decode run inside the mapPartitions batch
  * boundary (codec state amortized per task, the [[Blob]] contract),
  * blob bytes never ride a shuffle, output is one slim row per blob.
  */
object Png {

  // memory-cached ImageIO streams (the default is a temp FILE per
  // blob — see the note in Gif.scala); once per executor JVM
  ImageIO.setUseCache(false)

  /** Encode the [[Bmp]]-rule pixels of `text` as a real PNG via
    * ImageIO — deflate-compressed, CRC-checked, viewable.
    */
  def synth(text: String): Array[Byte] = {
    require(text.forall(_ < 0x80),
      "png synth input must be ASCII; non-ASCII would diverge from the oracle")
    val bytes = text.getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    require(bytes.nonEmpty, "png synth input must be non-empty")
    val w = Bmp.Width
    val h = ((bytes.length + 2) / 3 + w - 1) / w
    val img = new BufferedImage(w, h, BufferedImage.TYPE_3BYTE_BGR)
    // fill the raster directly: TYPE_3BYTE_BGR stores rows top-down,
    // B,G,R per pixel
    val raster = img.getRaster.getDataBuffer.asInstanceOf[DataBufferByte].getData
    def byteAt(k: Int): Int = if (k < bytes.length) bytes(k) & 0xff else 0
    var p = 0
    while (p < w * h) {
      raster(3 * p) = byteAt(3 * p + 2).toByte     // B
      raster(3 * p + 1) = byteAt(3 * p + 1).toByte // G
      raster(3 * p + 2) = byteAt(3 * p).toByte     // R
      p += 1
    }
    val out = new ByteArrayOutputStream()
    require(ImageIO.write(img, "png", out), "no PNG writer available")
    out.toByteArray
  }

  /** Decoded image statistics, image-space semantics (top-left
    * origin, RGB naming); luma uses the integer 299/587/114 weights.
    */
  case class PngMeta(width: Int, height: Int, nPx: Long,
      sumR: Long, sumG: Long, sumB: Long,
      col0Sum: Long, bottomRowSum: Long, lumaMax: Long, lumaSum: Long)

  /** REAL decode: `ImageIO.read` inflates the zlib stream, reverses
    * the scanline filters and hands back pixels; features are computed
    * from the decoded image only (never from the input text), so a
    * codec round-trip bug diverges the oracle hash.
    */
  def parse(png: Array[Byte]): PngMeta = {
    require(png.length >= 8 &&
      (png(0) & 0xff) == 0x89 && png(1) == 'P'.toByte &&
      png(2) == 'N'.toByte && png(3) == 'G'.toByte,
      "not a PNG container")
    val img = ImageIO.read(new ByteArrayInputStream(png))
    require(img != null, "ImageIO failed to decode the PNG stream")
    val w = img.getWidth
    val h = img.getHeight
    var sumR = 0L; var sumG = 0L; var sumB = 0L
    var col0 = 0L; var bottom = 0L; var lumaMax = 0L; var lumaSum = 0L
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val rgb = img.getRGB(x, y)
        val r = (rgb >> 16) & 0xff
        val g = (rgb >> 8) & 0xff
        val b = rgb & 0xff
        sumR += r; sumG += g; sumB += b
        if (x == 0) col0 += r + g + b
        if (y == h - 1) bottom += r + g + b
        val luma = 299L * r + 587L * g + 114L * b
        if (luma > lumaMax) lumaMax = luma
        lumaSum += luma
        x += 1
      }
      y += 1
    }
    PngMeta(w, h, w.toLong * h, sumR, sumG, sumB, col0, bottom, lumaMax, lumaSum)
  }

  /** One output row per blob. */
  case class PngRow(doc_id: Long, width: Long, height: Long, n_px: Long,
      col0_sum: Long, bottom_row_sum: Long, luma_max: Long, luma_sum: Long)

  /** End-to-end pipeline over a (doc_id, text) frame: synthesize →
    * REAL PNG encode → REAL PNG decode → features, one mapPartitions
    * pass (the [[Blob]] batch boundary).
    */
  def features(spark: SparkSession, docs: DataFrame): Dataset[PngRow] = {
    import spark.implicits._
    docs.selectExpr("cast(doc_id as long) doc_id", "text").as[(Long, String)]
      .mapPartitions { rows =>
        rows.map { case (id, text) =>
          val m = parse(synth(text))
          PngRow(id, m.width.toLong, m.height.toLong, m.nPx,
            m.col0Sum, m.bottomRowSum, m.lumaMax, m.lumaSum)
        }
      }
  }
}
