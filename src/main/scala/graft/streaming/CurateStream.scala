package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.util.LongAccumulator

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
  * lowest-id rule. Stream ≡ batch REQUIRES that ordering, so a
  * violation is OBSERVABLE, not silent: the state stores the emitted
  * doc_id, and any later arrival with a LOWER id (the one case where
  * first-arrived ≠ lowest-id) is counted on a named accumulator
  * ([[curatedCounting]]) and logged — the divergence-from-batch
  * telemetry an ingest operator alarms on.
  *
  * State is one Long per distinct normalized hash. [[curated]] keeps
  * it forever (the exact batch twin); [[curatedBounded]] is the
  * 100 TB-feed variant — an EVENT-TIME TIMEOUT drops a hash's state
  * once the watermark passes its last sighting + the re-upload
  * horizon, so state is bounded by the horizon's hash cardinality.
  * Within the horizon semantics are unchanged; a duplicate arriving
  * PAST the horizon re-admits (emits again) — the documented,
  * deterministic degrade, exactly how a production re-upload window
  * behaves (spec-pinned in CurateStreamSpec).
  *
  * The LR weights arrive as the pretrained artifact (4 scalar
  * literals — the batch serve contract); no training happens in the
  * stream.
  */
object CurateStream {

  case class CurRow(doc_id: Long, source: String, lang: String, n_chars: Long,
      h: String, x1m: Long, x2m: Long, x3m: Long, is_bench: Boolean)

  /** [[CurRow]] + the ingest event time — [[curatedBounded]]'s input
    * row (the horizon needs an event-time column to time out against).
    */
  case class CurRowT(doc_id: Long, source: String, lang: String, n_chars: Long,
      h: String, x1m: Long, x2m: Long, x3m: Long, is_bench: Boolean,
      ts: java.sql.Timestamp)

  /** Per-(hash, micro-batch) dedup telemetry: how many docs arrived
    * for the key, whether one was emitted (first-ever batch), and the
    * emitted representative's gate inputs — [[funnel]]'s unit of
    * attrition accounting.
    */
  case class FunnelDelta(n_arrived: Long, emitted: Boolean,
      x1m: Long, x2m: Long, x3m: Long, is_bench: Boolean)

  private lazy val log = org.slf4j.LoggerFactory.getLogger(getClass)

  /** The ONE key-batch dedup decision all three entry points share
    * (the curateBase/assignCells anti-drift discipline): first-ever
    * batch emits the batch's lowest doc_id and records it in state;
    * later batches emit nothing, but any arrival with an id LOWER
    * than the recorded winner — the only case where the stream's
    * first-arrived rule can diverge from the batch lowest-id rule —
    * is counted and logged instead of silently swallowed.
    */
  private def dedupStep[R](rows: Seq[R], state: GroupState[Long],
      idOf: R => Long, lateLower: Option[LongAccumulator]): Option[R] =
    if (state.exists) {
      val n = rows.count(r => idOf(r) < state.get)
      if (n > 0) {
        lateLower.foreach(_.add(n.toLong))
        log.warn(s"curate-stream: $n duplicate(s) arrived with doc_id lower than " +
          s"the already-emitted representative ${state.get}; keeping the " +
          "first-arrived winner — output diverges from the batch lowest-id rule " +
          "(feed not id-ordered)")
      }
      None
    } else {
      val win = rows.minBy(idOf)
      state.update(idOf(win))
      Some(win)
    }

  /** The stateless tail of the gate (trained-LR keep + bench drop)
    * over a deduped frame — one copy shared by [[curated]] and
    * [[curatedBounded]].
    */
  private def gate(deduped: DataFrame, weights: Array[Long]): DataFrame =
    deduped
      .withColumn("p_quality", TextOps.lrPm(weights) / lit(1e6))
      .filter(col("p_quality") >= 0.5 && !col("is_bench"))
      .select(col("doc_id"), col("source"), col("lang"),
        col("n_chars"), col("p_quality"))

  /** Curate a STREAMING frame with the documents schema
    * (doc_id, text, lang, source, n_chars): returns the kept docs
    * with their quality score — one slim row per surviving document.
    */
  def curated(docs: DataFrame, weights: Array[Long]): DataFrame =
    curatedCounting(docs, weights)._1

  /** [[curated]] plus its divergence telemetry: the returned
    * accumulator counts late lower-id duplicate arrivals (how often
    * the first-arrived winner differs from the batch lowest-id rule —
    * 0 on any id-ordered feed).
    */
  def curatedCounting(docs: DataFrame,
      weights: Array[Long]): (DataFrame, LongAccumulator) = {
    val spark = docs.sparkSession
    import spark.implicits._
    val lateAcc = spark.sparkContext.longAccumulator("curate_stream_late_lower_id")
    val deduped: Dataset[CurRow] = CorpusOps.curateBase(docs).as[CurRow]
      .groupByKey(_.h)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: String, rows: Iterator[CurRow], state: GroupState[Long]) =>
          dedupStep[CurRow](rows.toSeq, state, _.doc_id, Some(lateAcc)).iterator
      }
    (gate(deduped.toDF(), weights), lateAcc)
  }

  /** [[curated]] with BOUNDED dedup state: `docs` additionally
    * carries an event-time `ts` column; each hash's state is dropped
    * once the watermark passes its last sighting + `horizonMs` (the
    * re-upload horizon). Within the horizon the gate semantics are
    * exactly [[curated]]'s; a past-horizon duplicate re-admits — the
    * deterministic, documented degrade a bounded re-upload window
    * buys its bounded state with.
    */
  def curatedBounded(docs: DataFrame, weights: Array[Long],
      horizonMs: Long, lateness: String = "0 seconds"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val deduped: Dataset[CurRowT] =
      CorpusOps.curateBase(docs.withWatermark("ts", lateness), col("ts")).as[CurRowT]
        .groupByKey(_.h)
        .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
          (_: String, rows: Iterator[CurRowT], state: GroupState[Long]) =>
            if (state.hasTimedOut) {
              // horizon elapsed with no sighting: forget the hash —
              // the next duplicate re-admits (state stays bounded)
              state.remove()
              Iterator.empty
            } else {
              val rs = rows.toSeq
              val out = dedupStep[CurRowT](rs, state, _.doc_id, None)
              // every sighting re-arms the horizon (sliding window —
              // a re-upload inside the horizon keeps the hash hot);
              // floor at watermark+1: setTimeoutTimestamp rejects
              // timestamps at or before the current watermark
              state.setTimeoutTimestamp(math.max(
                state.getCurrentWatermarkMs() + 1,
                rs.map(_.ts.getTime).max + horizonMs))
              out.iterator
            }
        }
    gate(deduped.toDF().drop("ts"), weights)
  }

  /** The gate's ATTRITION telemetry as a stream — q_curate_funnel's
    * streaming twin over the stages the stream owns (total →
    * after_dedup → after_quality → after_bench_drop): per micro-batch
    * the dedup pass emits one [[FunnelDelta]] per touched hash, and a
    * Complete-mode global aggregation (Spark keeps one sum-state
    * cell per stage) folds them into CUMULATIVE per-stage survivor
    * counts — each trigger emits the funnel-so-far, the observability
    * a production ingest gate alarms on. Stage flags reuse the exact
    * gate columns ([[TextOps.lrP]] + is_bench), and the spec pins
    * cumulative stream counts ≡ the batch funnel's first four rows on
    * a planted corpus across a checkpoint restart.
    */
  def funnel(docs: DataFrame, weights: Array[Long]): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val deltas: Dataset[FunnelDelta] = CorpusOps.curateBase(docs).as[CurRow]
      .groupByKey(_.h)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: String, rows: Iterator[CurRow], state: GroupState[Long]) =>
          val rs = rows.toSeq
          Iterator.single(dedupStep[CurRow](rs, state, _.doc_id, None) match {
            case Some(w) =>
              FunnelDelta(rs.size.toLong, emitted = true, w.x1m, w.x2m, w.x3m, w.is_bench)
            case None =>
              FunnelDelta(rs.size.toLong, emitted = false, 0L, 0L, 0L, is_bench = false)
          })
      }
    deltas.toDF()
      // the SAME trained gate the output path applies — guarded by
      // `emitted` so the zero-filled non-emitting deltas can't leak
      // into the quality count
      .withColumn("q", col("emitted") && TextOps.lrPm(weights) >= 500000L)
      .groupBy()
      .agg(
        sum(col("n_arrived")).as("n0"),
        sum(when(col("emitted"), 1L).otherwise(0L)).as("n1"),
        sum(when(col("q"), 1L).otherwise(0L)).as("n2"),
        sum(when(col("q") && !col("is_bench"), 1L).otherwise(0L)).as("n3"))
      .selectExpr(
        """stack(4,
          |  CAST(0 AS BIGINT), 'total', n0,
          |  CAST(1 AS BIGINT), 'after_dedup', n1,
          |  CAST(2 AS BIGINT), 'after_quality', n2,
          |  CAST(3 AS BIGINT), 'after_bench_drop', n3
          |) AS (stage_idx, stage, n_docs)""".stripMargin)
  }
}
