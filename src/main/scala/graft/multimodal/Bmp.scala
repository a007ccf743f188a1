package graft.multimodal

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** REAL (non-stub) image decode for the multimodal suite: the BMP
  * container is pure byte layout — little-endian headers, bottom-up
  * row order, 4-byte row padding, BGR channel order — so, like
  * [[Wav]], this half of the image path runs genuinely end to end
  * with no codec library: build real BMP bytes, parse the headers,
  * walk the padded pixel rows, emit image features. The
  * [[Blob.decodeStub]] boundary stays only for genuinely-codec
  * formats (JPEG/PNG's zlib/H.264).
  *
  * Synthesis is deterministic from the text corpus: pixel p (row-major
  * in IMAGE space, top-left origin) has R = byte 3p, G = byte 3p+1,
  * B = byte 3p+2 of the document text (0 beyond the end), on a fixed
  * [[Width]]-pixel-wide canvas. The oracle recomputes the expected
  * features from the SAME text with plain arithmetic, so the hash
  * check catches every classic BMP bug: forgetting the bottom-up row
  * order (caught by `top_row_sum` — the image-space top row is stored
  * LAST in the file), mis-stepping the row padding (stride 30 pads to
  * 32), and swapping the BGR storage order (caught by the per-channel
  * means).
  *
  * 100 TB shape: blobs decode inside the existing mapPartitions
  * boundary (decoder-init-per-task amortization), bytes never ride a
  * shuffle, output is one slim row per blob.
  */
object Bmp {

  /** 10 px → 30-byte rows padded to 32: the width is chosen so the
    * 4-byte row alignment is actually exercised (a multiple-of-4
    * stride would let a padding bug pass silently).
    */
  val Width = 10

  /** 24-bit bottom-up BMP bytes with pixels derived from `text` —
    * a real, viewable image file.
    */
  def synth(text: String): Array[Byte] = {
    // fail-loud ASCII guard (the Wav.synth discipline): the oracle
    // computes ord(char); a non-ASCII char must error, not alias
    require(text.forall(_ < 0x80),
      "bmp synth input must be ASCII; non-ASCII would diverge from the oracle")
    val bytes = text.getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    require(bytes.nonEmpty, "bmp synth input must be non-empty")
    val nPxRaw = (bytes.length + 2) / 3
    val height = (nPxRaw + Width - 1) / Width
    val stride = (Width * 3 + 3) & ~3 // 30 → 32
    val dataLen = stride * height
    val buf = ByteBuffer.allocate(54 + dataLen).order(ByteOrder.LITTLE_ENDIAN)
    // BITMAPFILEHEADER
    buf.put('B'.toByte).put('M'.toByte)
      .putInt(54 + dataLen)                 // file size
      .putShort(0.toShort).putShort(0.toShort) // reserved
      .putInt(54)                           // pixel-array offset
    // BITMAPINFOHEADER
    buf.putInt(40).putInt(Width).putInt(height)
      .putShort(1.toShort)                  // planes
      .putShort(24.toShort)                 // bpp
      .putInt(0)                            // BI_RGB (uncompressed)
      .putInt(dataLen)
      .putInt(2835).putInt(2835)            // 72 DPI in px/m
      .putInt(0).putInt(0)                  // palette sizes
    def byteAt(k: Int): Int = if (k < bytes.length) bytes(k) & 0xff else 0
    // rows are stored BOTTOM-UP: file row f holds image row height-1-f
    var f = 0
    while (f < height) {
      val imgRow = height - 1 - f
      var c = 0
      while (c < Width) {
        val p = imgRow * Width + c
        // stored channel order is B, G, R
        buf.put(byteAt(3 * p + 2).toByte)
          .put(byteAt(3 * p + 1).toByte)
          .put(byteAt(3 * p).toByte)
        c += 1
      }
      var pad = stride - Width * 3
      while (pad > 0) { buf.put(0.toByte); pad -= 1 }
      f += 1
    }
    buf.array()
  }

  /** Parsed header + image stats of one BMP blob, in IMAGE-space
    * semantics (top-left origin, RGB channel naming).
    */
  case class BmpMeta(width: Int, height: Int, nPx: Long,
      sumR: Long, sumG: Long, sumB: Long, topRowSum: Long, lumaSum: Long)

  /** Header-walking BMP parse: verifies the magic, honors the
    * declared pixel-array offset (not a hardcoded 54), reads the DIB
    * dimensions, then walks the bottom-up padded rows reconstructing
    * image-space statistics. Fails loudly on malformed or unsupported
    * containers.
    */
  def parse(bmp: Array[Byte]): BmpMeta = {
    val buf = ByteBuffer.wrap(bmp).order(ByteOrder.LITTLE_ENDIAN)
    require(buf.remaining() >= 54, s"truncated BMP: ${buf.remaining()} bytes")
    require(buf.get() == 'B'.toByte && buf.get() == 'M'.toByte, "not a BM container")
    buf.getInt // declared file size
    buf.getShort; buf.getShort
    val pixelOffset = buf.getInt
    val dibSize = buf.getInt
    require(dibSize >= 40, s"unsupported DIB header size $dibSize")
    val width = buf.getInt
    val height = buf.getInt
    require(width > 0 && height > 0, s"unsupported dimensions ${width}x$height")
    buf.getShort // planes
    val bpp = buf.getShort
    require(bpp == 24, s"not 24-bit (bpp $bpp)")
    val compression = buf.getInt
    require(compression == 0, s"compressed BMP (method $compression)")
    val stride = (width * 3 + 3) & ~3
    require(pixelOffset >= 14 + dibSize && pixelOffset + stride.toLong * height <= bmp.length,
      s"pixel array [$pixelOffset, +${stride.toLong * height}) outside ${bmp.length}-byte file")
    var sumR = 0L; var sumG = 0L; var sumB = 0L
    var topRowSum = 0L; var lumaSum = 0L
    var f = 0
    while (f < height) {
      val imgRow = height - 1 - f // bottom-up storage
      val rowBase = pixelOffset + f * stride
      var c = 0
      while (c < width) {
        val b = bmp(rowBase + 3 * c) & 0xff
        val g = bmp(rowBase + 3 * c + 1) & 0xff
        val r = bmp(rowBase + 3 * c + 2) & 0xff
        sumR += r; sumG += g; sumB += b
        if (imgRow == 0) topRowSum += r + g + b
        lumaSum += 299L * r + 587L * g + 114L * b
        c += 1
      }
      f += 1
    }
    BmpMeta(width, height, width.toLong * height, sumR, sumG, sumB, topRowSum, lumaSum)
  }

  /** One output row per blob; channel means are UNROUNDED — the
    * registered query rounds in the DataFrame layer.
    */
  case class BmpRow(doc_id: Long, width: Long, height: Long, n_px: Long,
      mean_r: Double, mean_g: Double, mean_b: Double,
      top_row_sum: Long, luma_sum: Long)

  /** The end-to-end pipeline over a (doc_id, text) frame: synthesize
    * the BMP blob, parse it back through the header/row walker, emit
    * features — build and decode both real, inside one mapPartitions
    * pass (the [[Blob]] batch boundary).
    */
  def features(spark: SparkSession, docs: DataFrame): Dataset[BmpRow] = {
    import spark.implicits._
    docs.selectExpr("cast(doc_id as long) doc_id", "text").as[(Long, String)]
      .mapPartitions { rows =>
        rows.map { case (id, text) =>
          val m = parse(synth(text))
          BmpRow(id, m.width.toLong, m.height.toLong, m.nPx,
            m.sumR.toDouble / m.nPx, m.sumG.toDouble / m.nPx, m.sumB.toDouble / m.nPx,
            m.topRowSum, m.lumaSum)
        }
      }
  }
}
