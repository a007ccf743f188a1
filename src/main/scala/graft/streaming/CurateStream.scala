package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.{CorpusOps, TextOps}

/** Streaming ingest-time curation — the curation pipeline's FRONT
  * (exact normalized dedup → trained-LR quality keep → benchmark-doc
  * drop) applied as documents ARRIVE, the streaming twin of
  * `q_curate_e2e`'s first three stages the way NearDupStream twins
  * the minhash candidate stage: a production corpus is curated on
  * ingest, not re-curated from scratch per snapshot.
  *
  * Stage order is the batch pipeline's, and it is LOAD-BEARING:
  * dedup runs BEFORE the quality gate. The batch keeps the LOWEST
  * doc_id per normalized hash and only then scores it — filtering
  * first would let a passing duplicate survive when its canonical
  * representative fails the gate, silently diverging from the batch
  * answer. With an id-ordered feed (ingest order in production),
  * streaming first-arrival-wins dedup ≡ the batch lowest-id rule,
  * and the spec proves stream ≡ batch on a planted-duplicate corpus
  * across micro-batch boundaries.
  *
  * The LR weights arrive as the pretrained artifact (4 scalar
  * literals — the batch serve contract); no training happens in the
  * stream. State = one record per distinct normalized hash
  * (`dropDuplicates`); at 100 TB of ingest, bound it with
  * `dropDuplicatesWithinWatermark` once content re-uploads have a
  * known horizon — the gate semantics are unchanged.
  */
object CurateStream {

  /** Curate a STREAMING frame with the documents schema
    * (doc_id, text, lang, source, n_chars): returns the kept docs
    * with their quality score — one slim row per surviving document.
    */
  def curated(docs: DataFrame, weights: Array[Double]): DataFrame =
    CorpusOps.curateBase(docs)
      .dropDuplicates("h")
      .withColumn("p_quality", TextOps.lrP(weights))
      .filter(col("p_quality") >= 0.5 && !col("is_bench"))
      .select(col("doc_id"), col("source"), col("lang"),
        col("n_chars"), col("p_quality"))
}
