package graft.multimodal

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** REAL (non-stub) audio decode for the multimodal suite: RIFF/WAVE
  * container parsing and PCM sample statistics are pure byte
  * arithmetic — `java.nio` suffices, no codec library — so this half
  * of the media path runs genuinely end to end: build real WAV bytes,
  * walk the chunk structure, read the format header, decode PCM16
  * samples, emit signal features. The [[Blob.decodeStub]] boundary
  * now covers only genuinely-codec formats (JPEG/H.264/...), exactly
  * as narrow as the environment forces it to be.
  *
  * Synthesis is deterministic from the text corpus (sample i =
  * (byte_i − 96) · 256, PCM16 mono at [[SampleRate]] Hz), so the
  * oracle can recompute the expected features from the SAME text with
  * plain arithmetic — the parse is then hash-checked against ground
  * truth: any header-offset or endianness bug diverges the hash.
  *
  * 100 TB shape: blobs decode inside the existing mapPartitions
  * boundary (codec-init-per-task amortization), bytes never ride a
  * shuffle, output is one slim row per blob.
  */
object Wav {

  val SampleRate = 16000
  private val BitsPerSample = 16

  /** PCM16 mono RIFF/WAVE bytes with samples derived from `text`
    * ((byte − 96) · 256 per character) — a real, playable WAV file.
    */
  def synth(text: String): Array[Byte] = {
    // fail-loud ASCII guard (the guardFrameBound discipline): US_ASCII
    // getBytes silently maps non-ASCII chars to '?' (0x3F) while the
    // oracle computes ord(char) — a non-ASCII document would
    // hash-diverge instead of erroring
    require(text.forall(_ < 0x80),
      "wav synth input must be ASCII; non-ASCII would alias to '?' and silently diverge from the oracle")
    val bytes = text.getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    val dataLen = bytes.length * 2
    val buf = ByteBuffer.allocate(44 + dataLen).order(ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes).putInt(36 + dataLen).put("WAVE".getBytes)
    buf.put("fmt ".getBytes).putInt(16)
      .putShort(1.toShort)                                   // PCM
      .putShort(1.toShort)                                   // mono
      .putInt(SampleRate)
      .putInt(SampleRate * BitsPerSample / 8)                // byte rate
      .putShort((BitsPerSample / 8).toShort)                 // block align
      .putShort(BitsPerSample.toShort)
    buf.put("data".getBytes).putInt(dataLen)
    bytes.foreach(b => buf.putShort((((b & 0xff) - 96) * 256).toShort))
    buf.array()
  }

  /** Parsed header + signal stats of one WAV blob. */
  case class WavMeta(sampleRate: Int, channels: Int, bitDepth: Int,
      nSamples: Long, rms: Double, peak: Long)

  /** Chunk-walking RIFF/WAVE parse: verifies the RIFF/WAVE magic,
    * iterates chunks (skipping unknown ones by their declared size —
    * the part naive offset-44 readers get wrong), reads `fmt `, and
    * decodes the PCM16 `data` payload into RMS/peak. Fails loudly on
    * malformed containers.
    */
  def parse(wav: Array[Byte]): WavMeta = {
    val buf = ByteBuffer.wrap(wav).order(ByteOrder.LITTLE_ENDIAN)
    def tag(): String = { val t = new Array[Byte](4); buf.get(t); new String(t, "US-ASCII") }
    require(tag() == "RIFF", "not a RIFF container")
    buf.getInt // declared riff size
    require(tag() == "WAVE", "not a WAVE form")
    var sampleRate = -1; var channels = -1; var bitDepth = -1
    var nSamples = 0L; var sumSq = 0L; var peak = 0L
    while (buf.remaining() >= 8) {
      val id = tag(); val size = buf.getInt
      // loud bound check BEFORE any read: an oversized declared chunk
      // must be a diagnosable container error, not a raw
      // BufferUnderflowException from deep inside a getShort
      require(size >= 0 && size <= buf.remaining(),
        s"chunk '$id' declares $size bytes, only ${buf.remaining()} remain")
      // RIFF chunks are word-aligned: an odd-sized chunk is followed by
      // a pad byte (clamped — a final chunk may end the file unpadded)
      val next = math.min(buf.position() + size + (size & 1), buf.limit())
      id match {
        case "fmt " =>
          val audioFormat = buf.getShort
          require(audioFormat == 1, s"not PCM (format $audioFormat)")
          channels = buf.getShort.toInt
          sampleRate = buf.getInt
          buf.getInt; buf.getShort // byte rate, block align
          bitDepth = buf.getShort.toInt
        case "data" =>
          require(bitDepth == 16, s"PCM$bitDepth data before/without fmt")
          var i = 0
          while (i < size / 2) {
            val s = buf.getShort.toLong
            sumSq += s * s
            val a = math.abs(s); if (a > peak) peak = a
            i += 1
          }
          nSamples += size / 2
        case _ => // unknown chunk: skipped via `next`
      }
      buf.position(next)
    }
    require(sampleRate > 0 && nSamples > 0, "missing fmt or data chunk")
    WavMeta(sampleRate, channels, bitDepth, nSamples,
      math.sqrt(sumSq.toDouble / nSamples), peak)
  }

  /** One output row per blob; `rms` is UNROUNDED — the registered
    * query rounds in the DataFrame layer (Spark `round`, the rounding
    * already proven oracle-compatible by the other blob features).
    */
  case class WavRow(doc_id: Long, sample_rate: Long, n_channels: Long,
      bit_depth: Long, n_samples: Long, rms: Double, peak: Long)

  /** The end-to-end pipeline over a (doc_id, text) frame: synthesize
    * the WAV blob, parse it back through the chunk walker, emit
    * features — build and decode both real, inside one mapPartitions
    * pass (the [[Blob]] batch boundary).
    */
  def features(spark: SparkSession, docs: DataFrame): Dataset[WavRow] = {
    import spark.implicits._
    docs.selectExpr("cast(doc_id as long) doc_id", "text").as[(Long, String)]
      .mapPartitions { rows =>
        // per-task decoder init would go here
        rows.map { case (id, text) =>
          val m = parse(synth(text))
          WavRow(id, m.sampleRate.toLong, m.channels.toLong, m.bitDepth.toLong,
            m.nSamples, m.rms, m.peak)
        }
      }
  }
}
