package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** §2.F (streaming twins) — SCD type-2 history maintenance as a
  * stream: the continuous version of
  * [[graft.operators.CdcOps.scd2]]'s batch lead-window build. Each
  * incoming change CLOSES the key's open validity interval (an
  * upsert-emission of that row with `valid_to` set) and — unless it
  * is a `d` tombstone — OPENS its own interval (emitted with
  * `is_current = true`). A key whose newest change is a delete ends
  * fully closed with no current row; a later re-insert resurrects it
  * with a fresh interval, exactly the batch semantics.
  *
  * Emissions are UPSERTS keyed by (user_id, event_id): a row is first
  * emitted open and later re-emitted closed, and the sink's
  * last-write-wins apply (the [[UpsertSink]] contract) converges the
  * store to the batch history — Scd2StreamSpec proves emitted-stream ≡
  * [[graft.operators.CdcOps.scd2]] on the real feed across
  * micro-batch boundaries.
  *
  * Ordering contract: CDC sources deliver per-key in commit order
  * (Debezium's per-key partition guarantee), and intra-batch the
  * function sorts by (ts_ns, event_id). A LATE record older than the
  * open interval cannot splice history that has already been emitted
  * downstream; it is emitted as an already-closed interval ending at
  * the open row's start (its true successor under in-order delivery)
  * — the standard late-fact concession, spec-pinned.
  *
  * State per key is ONE row (the open interval) — O(live keys), not
  * O(history): closures leave the state machine immediately, so the
  * stream runs indefinitely. 100 TB: keyed state on user_id, the
  * same shuffle as compactState; history volume lands in the sink,
  * never in state.
  */
object Scd2Stream {

  /** One SCD2 history row; `valid_to_ns = None` ⇔ the open interval. */
  case class Scd2Row(
      user_id: Long, event_id: Long, op: String, event_type: String,
      value: Double, valid_from_ns: Long, valid_to_ns: Option[Long],
      is_current: Boolean)

  /** Keyed SCD2 maintenance over a change stream (Update mode: each
    * output row is an upsert by (user_id, event_id)).
    */
  def scd2State(spark: SparkSession,
      changes: Dataset[CdcStream.Change]): Dataset[Scd2Row] = {
    import spark.implicits._
    changes
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout)(
        (userId: Long, batch: Iterator[CdcStream.Change], state: GroupState[Scd2Row]) => {
          var open = state.getOption
          val out = Vector.newBuilder[Scd2Row]
          batch.toSeq.sortBy(c => (c.ts_ns, c.event_id)).foreach { c =>
            open match {
              case Some(o) if c.ts_ns < o.valid_from_ns ||
                  (c.ts_ns == o.valid_from_ns && c.event_id < o.event_id) =>
                // late fact: its interval ran until the open row began
                if (c.op != "d")
                  out += Scd2Row(userId, c.event_id, c.op, c.event_type,
                    c.value, c.ts_ns, Some(o.valid_from_ns), is_current = false)
              case _ =>
                // close the open interval at this change's time
                open.foreach { o =>
                  out += o.copy(valid_to_ns = Some(c.ts_ns), is_current = false)
                }
                if (c.op == "d") open = None
                else {
                  val r = Scd2Row(userId, c.event_id, c.op, c.event_type,
                    c.value, c.ts_ns, None, is_current = true)
                  out += r
                  open = Some(r)
                }
            }
          }
          open match {
            case Some(o) => state.update(o)
            case None    => if (state.exists) state.remove()
          }
          out.result().iterator
        })
  }
}
