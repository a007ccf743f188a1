package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

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
  * answer.
  *
  * Dedup is a keyed-state `flatMapGroupsWithState`, NOT a bare
  * `dropDuplicates`: dropDuplicates keeps an ARBITRARY row per key
  * within a micro-batch (shuffle fetch order), so two same-hash docs
  * landing in one batch would pick a nondeterministic winner whose
  * raw text — and therefore features and bench flag — differs. Here
  * each hash's first-ever batch emits that batch's LOWEST doc_id
  * (deterministic), later batches emit nothing; with an id-ordered
  * feed (ingest order in production) this is exactly the batch
  * lowest-id rule, and the spec proves stream ≡ batch on a
  * planted-duplicate corpus both across AND WITHIN micro-batch
  * boundaries. State is one boolean per distinct normalized hash;
  * at 100 TB of ingest, bound it with a state timeout once content
  * re-uploads have a known horizon — the gate semantics are
  * unchanged.
  *
  * The LR weights arrive as the pretrained artifact (4 scalar
  * literals — the batch serve contract); no training happens in the
  * stream.
  */
object CurateStream {

  case class CurRow(doc_id: Long, source: String, lang: String, n_chars: Long,
      h: String, x1: Double, x2: Double, x3: Double, is_bench: Boolean)

  /** Curate a STREAMING frame with the documents schema
    * (doc_id, text, lang, source, n_chars): returns the kept docs
    * with their quality score — one slim row per surviving document.
    */
  def curated(docs: DataFrame, weights: Array[Double]): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val deduped: Dataset[CurRow] = CorpusOps.curateBase(docs).as[CurRow]
      .groupByKey(_.h)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: String, rows: Iterator[CurRow], state: GroupState[Boolean]) =>
          if (state.exists) Iterator.empty
          else {
            state.update(true)
            Iterator(rows.minBy(_.doc_id))
          }
      }
    deduped.toDF()
      .withColumn("p_quality", TextOps.lrP(weights))
      .filter(col("p_quality") >= 0.5 && !col("is_bench"))
      .select(col("doc_id"), col("source"), col("lang"),
        col("n_chars"), col("p_quality"))
  }
}
