package graft.sources

import org.apache.spark.sql.{DataFrame, Observation, SparkSession}
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQueryListener
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.QueryExecutionListener

/** Debezium-style JSON wire format for the CDC change feed — the
  * SOURCE-CONNECTOR layer of the streaming CDC pipeline: what lands on
  * a Kafka topic or file queue is one JSON envelope per change. This
  * object renders the typed feed into that wire shape and parses it
  * back into the envelope the compactors consume, routing records that
  * fail to parse into a dead-letter frame instead of failing the
  * pipeline (connector practice: a poison message must never stall
  * ingestion).
  *
  * Envelope (Debezium field layout, trimmed): `op ∈ {c,u,d}`, `ts_ns`
  * the commit time, `key` the entity-key struct, `after` the row image
  * for c/u, `before` the last image for d. Reference semantics: the
  * nightly snapshot refresh (src/services/dataManager.ts:132-187)
  * shipped whole tables; the envelope is its per-row streaming
  * translation.
  *
  * 100 TB: serialize and parse are embarrassingly parallel codegen'd
  * projections (to_json / from_json) — no shuffle, no state; the
  * same functions run unchanged under readStream.
  */
object CdcEnvelope {

  /** Column carrying the raw line of a record that failed to parse. */
  val CorruptCol = "_corrupt"

  /** Wire schema. The corrupt column must be part of the schema for
    * PERMISSIVE from_json to route bad lines into it.
    */
  val schema: StructType = StructType.fromDDL(
    "op STRING, ts_ns BIGINT, key STRUCT<user_id: BIGINT>, " +
      "before STRUCT<event_id: BIGINT, event_type: STRING, value: DOUBLE>, " +
      s"after STRUCT<event_id: BIGINT, event_type: STRING, value: DOUBLE>, $CorruptCol STRING")

  /** The dtypes [[serialize]] requires of its input. Serializing a
    * mistyped frame (e.g. ts_ns as a TIMESTAMP after an upstream
    * loader regression) would render values the typed parse cannot
    * read back — every record dead-letters and the pipeline emits an
    * EMPTY snapshot instead of an error, the worst failure shape a
    * connector can have. Refuse at plan time instead.
    */
  private val wireInputTypes: Seq[(String, org.apache.spark.sql.types.DataType)] = {
    import org.apache.spark.sql.types._
    Seq("event_id" -> LongType, "ts_ns" -> LongType, "user_id" -> LongType,
      "op" -> StringType, "event_type" -> StringType, "value" -> DoubleType)
  }

  /** Renders a typed change feed (event_id, ts_ns, user_id, op,
    * event_type, value) into the wire frame: one JSON string per
    * change in column `value`, null image sides omitted. Throws
    * (loudly, at plan time) if any input column deviates from the
    * wire dtypes — see [[wireInputTypes]].
    */
  def serialize(feed: DataFrame): DataFrame = {
    for ((c, t) <- wireInputTypes) {
      val actual = feed.schema(c).dataType
      require(actual == t,
        s"CDC envelope input column $c is $actual but the wire schema requires $t — " +
          "refusing to serialize a frame whose records would all dead-letter on parse")
    }
    val img = struct(col("event_id"), col("event_type"), col("value"))
    feed.select(to_json(struct(
      col("op"),
      col("ts_ns"),
      struct(col("user_id")).as("key"),
      when(col("op") === "d", img).as("before"),
      when(col("op") =!= "d", img).as("after"))).as("value"))
  }

  /** Parses the wire frame back into the flat typed envelope. Rows
    * that fail JSON parsing carry the raw line in [[CorruptCol]] with
    * null typed fields; the image is taken from whichever side the op
    * populated (after for c/u, before for d).
    */
  def parse(wire: DataFrame): DataFrame =
    wire.select(from_json(col("value"), schema,
        Map("mode" -> "PERMISSIVE", "columnNameOfCorruptRecord" -> CorruptCol)).as("r"))
      .select(
        col("r.op").as("op"),
        col("r.ts_ns").as("ts_ns"),
        col("r.key.user_id").as("user_id"),
        coalesce(col("r.after.event_id"), col("r.before.event_id")).as("event_id"),
        coalesce(col("r.after.event_type"), col("r.before.event_type")).as("event_type"),
        coalesce(col("r.after.value"), col("r.before.value")).as("value"),
        col(s"r.$CorruptCol").as(CorruptCol))

  /** Well-formed records of a [[parse]] result, corrupt column dropped. */
  def records(parsed: DataFrame): DataFrame =
    parsed.filter(col(CorruptCol).isNull).drop(CorruptCol)

  /** Default ceiling on the tolerable dead-letter fraction: isolated
    * poison messages are connector reality, but a systemic parse
    * failure (schema drift, wrong topic) must stop the pipeline, not
    * quietly drain it.
    */
  val MaxDeadLetterFrac = 0.01

  /** Minimum records in a single progress event before its per-batch
    * dead-letter RATE is meaningful — below this, a lone poison
    * message dominates the fraction and would false-trip the guard
    * on exactly the isolated-poison case it must tolerate.
    */
  val MinBatchForRate = 100L

  /** [[records]] behind a STRICT dead-letter-rate guard, built INTO
    * the plan: a single-row count aggregate over the parsed frame is
    * broadcast-crossed into the record stream, and `raise_error`
    * fails the job at EXECUTION time — before a single record is
    * emitted — when more than `maxFrac` of records dead-lettered.
    * Fully lazy: constructing the frame (plan inspection, explain,
    * spec sweeps) runs no job; the guard evaluates exactly when the
    * query does.
    *
    * The aggregate branch is a SECOND pass over the parsed frame —
    * this is the inherent price of refusing to emit anything before
    * the global rate is known. Use it when the wire is materialized
    * storage (topic / landing files), where the extra pass is a
    * cheap re-read. When the wire is synthesized in-query, prefer
    * the one-pass [[guardedRun]] (write-audit-publish) or the
    * [[BatchDeadLetterGuard]] listener, both of which ride the
    * observation on the single execution already happening.
    */
  def guardedRecords(parsed: DataFrame, maxFrac: Double = MaxDeadLetterFrac): DataFrame = {
    val chk = broadcast(parsed
      .agg(count(lit(1)).as("total"), count(col(CorruptCol)).as("dead"))
      .select(
        when(col("total") > 0 && col("dead") / col("total") > maxFrac,
          raise_error(concat(
            lit("CDC parse dead-lettered "), col("dead"), lit(" of "), col("total"),
            lit(s" records (> ${100 * maxFrac}%) — systemic wire/schema mismatch, " +
              "failing the batch instead of emitting a silently incomplete snapshot"))))
          .otherwise(lit(1)).as("_guard_ok")))
    // the guard rides a FILTER, not a dropped projection: column
    // pruning would happily eliminate an unused raise_error column
    // (count(*) over the join needs no columns at all), silently
    // disarming the guard
    records(parsed).crossJoin(chk)
      .filter(col("_guard_ok") === 1)
      .drop("_guard_ok")
  }

  /** Dead-letter queue: the raw lines that failed to parse. */
  def deadLetters(parsed: DataFrame): DataFrame =
    parsed.filter(col(CorruptCol).isNotNull).select(col(CorruptCol).as("raw"))

  /** Name of the observed-metrics node [[DeadLetterGuard]] watches. */
  val GuardMetric = "cdc_wire_guard"

  /** [[parse]] with observed metrics (total records, dead-lettered
    * records) attached — ZERO extra passes, unlike the strict
    * [[guardedRecords]] count: the numbers ride the execution
    * already happening. Streaming: they surface in each
    * QueryProgressEvent for [[DeadLetterGuard]] to act on. Batch:
    * they surface in `QueryExecution.observedMetrics` for
    * [[BatchDeadLetterGuard]].
    */
  def observedParse(wire: DataFrame): DataFrame =
    parse(wire).observe(GuardMetric,
      count(lit(1)).as("total"), count(col(CorruptCol)).as("dead"))

  private def deadLetterMsg(dead: Long, total: Long, maxFrac: Double): String =
    s"CDC parse dead-lettered $dead of $total records (> ${100 * maxFrac}%) — " +
      "systemic wire/schema mismatch"

  /** One-pass STRICT batch guard, write-audit-publish shape: runs
    * `action` (typically a staging write) over the guarded records
    * and throws AFTER the action when the dead-letter fraction
    * exceeded `maxFrac` — the caller publishes the staged output
    * only when this returns. One wire pass total: the counts ride
    * the action's own execution via an [[Observation]]. `action`
    * MUST execute the frame it is given (write/collect/foreach);
    * a lazy action would leave the observation unresolved and this
    * call would block waiting for it.
    */
  def guardedRun[T](wire: DataFrame, maxFrac: Double = MaxDeadLetterFrac)(
      action: DataFrame => T): T = {
    val obs = new Observation()
    val recs = records(parse(wire).observe(obs,
      count(lit(1)).as("total"), count(col(CorruptCol)).as("dead")))
    val out = action(recs)
    val m = obs.get
    val (t, d) = (m("total").asInstanceOf[Long], m("dead").asInstanceOf[Long])
    if (t > 0 && d.toDouble / t > maxFrac)
      throw new IllegalStateException(deadLetterMsg(d, t, maxFrac) +
        " — do NOT publish the staged output of this run")
    out
  }

  /** Batch twin of [[DeadLetterGuard]]: a QueryExecutionListener
    * that reads the [[GuardMetric]] observation off every completed
    * batch action — zero extra passes — and records a loud violation
    * when the dead-letter fraction exceeds `maxFrac`. A listener
    * cannot retroactively fail the completed action (the same limit
    * the streaming kill switch has: the poisoned batch has already
    * flowed when it stops the query), so the deployed pattern is
    * write-audit-publish: stage the snapshot, check [[tripped]] /
    * [[violations]], publish only when clean — or use [[guardedRun]]
    * which packages exactly that and throws. Install once per
    * session via [[BatchDeadLetterGuard.install]].
    */
  class BatchDeadLetterGuard(maxFrac: Double = MaxDeadLetterFrac)
      extends QueryExecutionListener {
    private val viols = new java.util.concurrent.ConcurrentLinkedQueue[String]
    private val seen = new java.util.concurrent.atomic.AtomicLong
    def violations: Seq[String] = {
      import scala.jdk.CollectionConverters._
      viols.asScala.toSeq
    }
    def tripped: Boolean = !viols.isEmpty
    /** How many [[GuardMetric]] observations this guard has audited —
      * listener delivery is async, so an auditor (monitor, spec) must
      * wait for this to advance past its action before reading
      * [[tripped]]; absence-of-violation is only meaningful once the
      * action's metrics are known to have been delivered.
      */
    def observedCount: Long = seen.get
    /** Re-arm after a monitoring loop has acted on the violations. */
    def reset(): Unit = viols.clear()
    override def onSuccess(funcName: String, qe: QueryExecution, durationNs: Long): Unit =
      qe.observedMetrics.get(GuardMetric).foreach { m =>
        val (t, d) = (m.getAs[Long]("total"), m.getAs[Long]("dead"))
        if (t > 0 && d.toDouble / t > maxFrac) {
          val msg = deadLetterMsg(d, t, maxFrac)
          viols.add(msg)
          System.err.println(s"[cdc-wire-guard] $msg — this snapshot is " +
            "incomplete; do not publish it")
        }
        seen.incrementAndGet()
      }
    override def onFailure(funcName: String, qe: QueryExecution, ex: Exception): Unit = ()
  }

  object BatchDeadLetterGuard {
    // one guard per session, listener registered exactly once —
    // queries that attach observedParse can call install
    // unconditionally without stacking duplicate listeners
    private val installed =
      new java.util.concurrent.ConcurrentHashMap[SparkSession, BatchDeadLetterGuard]
    def install(spark: SparkSession,
        maxFrac: Double = MaxDeadLetterFrac): BatchDeadLetterGuard =
      installed.computeIfAbsent(spark, s => {
        val g = new BatchDeadLetterGuard(maxFrac)
        s.listenerManager.register(g)
        g
      })
  }

  /** Streaming twin of [[guardedRecords]]: watches [[observedParse]]'s
    * metrics on every progress event and STOPS the query once the
    * cumulative dead-letter fraction exceeds `maxFrac` — a mis-routed
    * topic or an upstream schema change halts the connector loudly
    * (stopped query + recorded reason) instead of draining the whole
    * feed into the dead-letter queue record by record. A listener
    * cannot make the query itself throw; stop-with-reason is the
    * Structured Streaming kill-switch shape. Isolated poison below the
    * threshold flows to [[deadLetters]] as before — a poison message
    * must never stall ingestion, but a systemic failure must.
    */
  class DeadLetterGuard(spark: SparkSession, maxFrac: Double = MaxDeadLetterFrac)
      extends StreamingQueryListener {
    // cumulative (total, dead) per RUN id — several wire streams can
    // run under one session, and one stream's poison must not trip or
    // dilute another's guard. Keying by runId (fresh per restart, vs
    // the checkpoint-stable query id) means a restarted query starts
    // from clean counters: a fixed feed is not re-killed by its old
    // poison, and a newly poisoned feed is not diluted by a previous
    // run's clean millions. Entries are evicted on termination, so
    // the map tracks live runs only.
    private val counts =
      new java.util.concurrent.ConcurrentHashMap[java.util.UUID, (Long, Long)]
    // trip reason per QUERY id: each stream gets its own kill switch;
    // one tripped stream must not disarm the guard for the others
    private val reasons =
      new java.util.concurrent.ConcurrentHashMap[java.util.UUID, String]
    /** Why the guard stopped a query, if it stopped any (first trip
      * when several); [[trippedReasonFor]] inspects a specific query.
      */
    def trippedReason: Option[String] = {
      val it = reasons.values().iterator()
      if (it.hasNext) Some(it.next()) else None
    }
    def trippedReasonFor(queryId: java.util.UUID): Option[String] =
      Option(reasons.get(queryId))
    def tripped: Boolean = !reasons.isEmpty
    /** Total wire records audited across LIVE runs (dead letters
      * included — they are parsed records too). Listener delivery is
      * async: an auditor asserting the guard stayed QUIET must first
      * wait for this to reach the volume it fed, otherwise the
      * assertion races the bus and an over-eager-guard regression
      * can slip through.
      */
    def recordsAudited: Long = {
      import scala.jdk.CollectionConverters._
      counts.values().asScala.map(_._1).sum
    }
    /** Queries the guard tripped on but FAILED to stop (stop threw —
      * timeout, interrupt): `tripped` alone must not be read as "the
      * kill switch fired"; a monitoring loop that sees an entry here
      * has a poisoned stream still draining and must escalate.
      */
    private val failedStops =
      new java.util.concurrent.ConcurrentHashMap[java.util.UUID, Throwable]
    def stopFailures: Map[java.util.UUID, Throwable] = {
      import scala.jdk.CollectionConverters._
      failedStops.asScala.toMap
    }
    // a restart re-arms the kill switch: without this, a query that
    // tripped, was fixed, and restarted could never be stopped again
    // (its stale trip reason would gate the stop branch forever).
    // failedStops re-arms too — a tripped-but-unstoppable query that
    // was fixed and restarted must not keep reporting a stale
    // "still draining; escalate" entry to the monitoring loop
    override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = {
      reasons.remove(e.id)
      failedStops.remove(e.id)
    }
    override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit =
      counts.remove(e.runId)
    override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = {
      val m = e.progress.observedMetrics.get(GuardMetric)
      if (m != null) {
        val (bt, bd) = (m.getAs[Long]("total"), m.getAs[Long]("dead"))
        val (t, d) = counts.merge(e.progress.runId, (bt, bd),
          (a, b) => (a._1 + b._1, a._2 + b._2))
        // trip on the CUMULATIVE rate (early systemic failure) OR the
        // per-progress-event rate (late-onset systemic failure: a
        // stream that ingested millions of clean records before the
        // break would otherwise have to dead-letter >maxFrac of
        // LIFETIME volume before stopping). The per-event check only
        // applies above a size floor: one poison message in a
        // 50-record trickle batch is 2% but is exactly the isolated
        // poison the guard must tolerate, not a schema break
        val cumulative = t > 0 && d.toDouble / t > maxFrac
        val thisBatch = bt >= MinBatchForRate && bd.toDouble / bt > maxFrac
        if ((cumulative || thisBatch) && !reasons.containsKey(e.progress.id)) {
          val scope = if (cumulative) s"$d of $t" else s"$bd of $bt (this batch)"
          reasons.put(e.progress.id,
            s"CDC stream dead-lettered $scope records (> ${100 * maxFrac}%) — " +
              s"systemic wire/schema mismatch, stopping query ${e.progress.id}")
          // stop() joins the stream's microbatch thread; the listener
          // runs on the progress path, so stop from a separate thread.
          // A FAILED stop (timeout/interrupt) is recorded loudly —
          // swallowing it would mask the exact silent-drain failure
          // the guard exists to prevent
          val qid = e.progress.id
          new Thread(() => {
            try Option(spark.streams.get(qid)).foreach(_.stop())
            catch {
              case t: Throwable =>
                failedStops.put(qid, t)
                System.err.println(
                  s"[cdc-wire-guard] FAILED to stop poisoned query $qid: $t — " +
                    "stream is still draining; escalate")
            }
          }, "cdc-wire-guard-stop").start()
        }
      }
    }
  }
}
