package graft.streaming

import scala.util.control.NonFatal

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

import graft.multimodal.Rle

/** Streaming MEDIA ingest gate — the codec path run at ingest, with
  * the failure stance a 100 TB stream needs. The batch media queries
  * are deliberately LOUD (a corrupted container aborts the job: on a
  * bounded snapshot you want the bad blob found, not averaged away),
  * but an always-on ingest stream must have the OPPOSITE stance: one
  * poison blob must never kill the query. This is the CdcEnvelope
  * dead-letter discipline applied to media: each arriving document
  * synthesizes + decodes through the SAME inter-frame codec pipeline
  * as the batch q_rle_frames (one call path — [[Rle.parseSampled]] ∘
  * [[Rle.synth]], so stream and batch can never drift), and a blob
  * whose build/walk/decode throws becomes a DEAD-LETTER row carrying
  * the failure reason while every healthy blob in the same
  * micro-batch flows through.
  *
  * Decode is STATELESS per document (the inter-frame state lives
  * INSIDE one blob's decode, never across rows), so the stream needs
  * no keyed state, restarts replay nothing, and cost is exactly the
  * batch decode paid incrementally. [[health]] adds the gate's
  * telemetry: cumulative ok/dead-letter document counts and the
  * dead-letter rate (one Complete-mode aggregation row) — the signal
  * that distinguishes an isolated bad upload from a broken upstream
  * encoder (the [[graft.sources.CdcEnvelope]] rate-ceiling stance).
  */
object MediaStream {

  case class Doc(doc_id: Long, text: String)

  /** Union-schema output: `ok` rows carry one sampled frame's
    * features (the q_rle_frames columns); dead-letter rows carry the
    * failure reason and sentinel features. One schema so a single
    * streaming query serves both sinks — downstream routes on `ok`.
    */
  case class MediaOut(doc_id: Long, ok: Boolean, frame_idx: Long,
      n_frames: Long, px_sum: Long, px_max: Long, row0_sum: Long,
      n_px_written: Long, err: String)

  /** Decode a streaming (or batch — identical code path) document
    * frame through the inter-frame codec; poison blobs dead-letter.
    */
  def decoded(docs: Dataset[Doc]): Dataset[MediaOut] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.mapPartitions { rows =>
      rows.flatMap { d =>
        try {
          Rle.parseSampled(Rle.synth(d.text)).map(fr =>
            MediaOut(d.doc_id, ok = true, fr.frameIdx.toLong, fr.nFrames.toLong,
              fr.pxSum, fr.pxMax.toLong, fr.row0Sum, fr.nPxWritten.toLong, null))
        } catch {
          case NonFatal(e) =>
            // the batch stance would abort here; the ingest gate
            // quarantines instead — reason preserved for triage
            // (e.toString carries the class even when getMessage is
            // null, so a message-less throw still triages)
            Seq(MediaOut(d.doc_id, ok = false, -1L, -1L, -1L, -1L, -1L, -1L,
              e.toString))
        }
      }
    }
  }

  /** The healthy side: exactly the q_rle_frames feature columns. */
  def features(out: Dataset[MediaOut]): DataFrame =
    out.filter(col("ok"))
      .select(col("doc_id"), col("frame_idx"), col("n_frames"),
        col("px_sum"), col("px_max"), col("row0_sum"), col("n_px_written"))

  /** The quarantine side: one row per poison blob with its reason. */
  def deadLetters(out: Dataset[MediaOut]): DataFrame =
    out.filter(!col("ok")).select(col("doc_id"), col("err"))

  /** Cumulative gate telemetry (Complete mode, one row): decoded and
    * dead-lettered DOCUMENT counts and the dead-letter rate. Healthy
    * docs are counted via their frame-0 row (the sampling stride
    * always emits ordinal 0), so no distinct aggregation is needed —
    * streaming-legal and exact.
    */
  def health(out: Dataset[MediaOut]): DataFrame =
    out.agg(
        // coalesce: a global sum over ZERO input rows is null — the
        // gate's first empty trigger must read (0, 0, 0.0), not nulls
        coalesce(sum(when(col("ok") && col("frame_idx") === 0L, 1L).otherwise(0L)),
          lit(0L)).as("n_ok_docs"),
        coalesce(sum(when(!col("ok"), 1L).otherwise(0L)), lit(0L)).as("n_dead_docs"))
      .select(col("n_ok_docs"), col("n_dead_docs"),
        round(col("n_dead_docs") /
          greatest(col("n_ok_docs") + col("n_dead_docs"), lit(1L)).cast("double"), 6)
          .as("dead_rate"))
}
