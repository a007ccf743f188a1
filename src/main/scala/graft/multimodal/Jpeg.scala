package graft.multimodal

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import javax.imageio.{IIOImage, ImageIO, ImageWriteParam}

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** REAL JPEG encode/decode for the multimodal suite — the LOSSY half
  * of the image path, via the JDK's built-in `javax.imageio` JPEG
  * codec (ships in `java.desktop`, headless-safe). Lossy means the
  * decoded pixels are NOT bit-reproducible by an arithmetic oracle,
  * so the hash-checkable surface splits in two, honestly:
  *
  *   - the REGISTERED query emits the codec-independent structure
  *     (width/height/n_px — a JPEG that decodes at all must get these
  *     exactly) plus `decode_ok`, a fidelity verdict computed from the
  *     REAL decode (mean |decoded − source| < [[MaeBound]]): garbage
  *     decode ⇒ false ⇒ oracle hash mismatch;
  *   - JpegSpec pins the quantitative half the oracle cannot: the
  *     per-document MAE is strictly positive somewhere (the codec is
  *     genuinely lossy — a byte-passthrough impostor fails) and
  *     bounded everywhere, and the blob carries the FFD8 SOI marker.
  *
  * The image is GRAYSCALE by design: the JDK encoder applies 4:2:0
  * chroma subsampling to color JPEGs at every quality (measured:
  * noise-image MAE ~48 even at quality 1.0), which would make a
  * fidelity bound meaningless; a single-channel image isolates the
  * DCT+quantization error the bound is meant to police (measured MAE
  * ~5.8 at the shipped [[Quality]] on byte-noise images).
  *
  * Pixel rule: gray sample p (row-major, [[Bmp.Width]]-wide canvas) =
  * text byte p (0 beyond the end), written/read via raw raster
  * samples (no colorspace conversion).
  *
  * 100 TB shape: encode+decode inside the mapPartitions batch
  * boundary, blob bytes never shuffled, one slim row per blob.
  */
object Jpeg {

  // memory-cached ImageIO streams (the default is a temp FILE per
  // blob — see the note in Gif.scala); once per executor JVM
  ImageIO.setUseCache(false)

  val Quality = 0.9f

  /** `decode_ok` bound on mean |decoded − source| per image — wide
    * enough for DCT error at [[Quality]] (measured ~5.8 on noise),
    * tight enough that a wrong-geometry or wrong-offset decode
    * (error ~uniform, MAE ~85 on bytes) fails it.
    */
  val MaeBound = 16.0

  /** Encode the grayscale pixels of `text` as a real JPEG. */
  def synth(text: String): Array[Byte] = {
    require(text.forall(_ < 0x80),
      "jpeg synth input must be ASCII; non-ASCII would diverge from the oracle")
    val bytes = text.getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    require(bytes.nonEmpty, "jpeg synth input must be non-empty")
    val w = Bmp.Width
    val h = (bytes.length + w - 1) / w
    val img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY)
    val raster = img.getRaster
    var p = 0
    while (p < w * h) {
      raster.setSample(p % w, p / w, 0, if (p < bytes.length) bytes(p) & 0xff else 0)
      p += 1
    }
    val writer = ImageIO.getImageWritersByFormatName("jpeg").next()
    val param = writer.getDefaultWriteParam
    param.setCompressionMode(ImageWriteParam.MODE_EXPLICIT)
    param.setCompressionQuality(Quality)
    val out = new ByteArrayOutputStream()
    val ios = ImageIO.createImageOutputStream(out)
    try {
      writer.setOutput(ios)
      writer.write(null, new IIOImage(img, null, null), param)
    } finally {
      ios.close()
      writer.dispose()
    }
    out.toByteArray
  }

  case class JpegMeta(width: Int, height: Int, nPx: Long, mae: Double)

  /** REAL decode + fidelity measurement: inflate the JPEG, read the
    * raw gray samples back, compare to the source samples. `source`
    * is the text the image was synthesized from — used ONLY as the
    * fidelity reference, never as the feature source.
    */
  def parse(jpeg: Array[Byte], source: String): JpegMeta = {
    require(jpeg.length >= 2 && (jpeg(0) & 0xff) == 0xff && (jpeg(1) & 0xff) == 0xd8,
      "not a JPEG container (missing FFD8 SOI)")
    val img = ImageIO.read(new ByteArrayInputStream(jpeg))
    require(img != null, "ImageIO failed to decode the JPEG stream")
    val w = img.getWidth
    val h = img.getHeight
    val bytes = source.getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    val raster = img.getRaster
    var sae = 0L
    var p = 0
    while (p < w * h) {
      val want = if (p < bytes.length) bytes(p) & 0xff else 0
      sae += math.abs(raster.getSample(p % w, p / w, 0) - want)
      p += 1
    }
    JpegMeta(w, h, w.toLong * h, sae.toDouble / (w.toLong * h))
  }

  case class JpegRow(doc_id: Long, width: Long, height: Long, n_px: Long,
      decode_ok: Boolean)

  /** Spec-facing variant carrying the raw MAE. */
  case class JpegMaeRow(doc_id: Long, mae: Double)

  /** End-to-end: synthesize → REAL JPEG encode → REAL JPEG decode →
    * structure + fidelity verdict, one mapPartitions pass.
    */
  def features(spark: SparkSession, docs: DataFrame): Dataset[JpegRow] = {
    import spark.implicits._
    docs.selectExpr("cast(doc_id as long) doc_id", "text").as[(Long, String)]
      .mapPartitions { rows =>
        rows.map { case (id, text) =>
          val m = parse(synth(text), text)
          JpegRow(id, m.width.toLong, m.height.toLong, m.nPx, m.mae < MaeBound)
        }
      }
  }

  /** Per-document MAE for the spec's quantitative pins. */
  def maeFrame(spark: SparkSession, docs: DataFrame): Dataset[JpegMaeRow] = {
    import spark.implicits._
    docs.selectExpr("cast(doc_id as long) doc_id", "text").as[(Long, String)]
      .mapPartitions { rows =>
        rows.map { case (id, text) => JpegMaeRow(id, parse(synth(text), text).mae) }
      }
  }
}
