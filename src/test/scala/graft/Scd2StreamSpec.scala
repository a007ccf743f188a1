package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.CdcOps
import graft.streaming.{CdcStream, Scd2Stream}
import graft.streaming.Scd2Stream.Scd2Row

/** Stream/batch parity of SCD2 maintenance: the converged upsert
  * stream over the REAL change feed (split across micro-batches)
  * must equal the batch lead-window history row for row; the late
  * path and tombstone closure are pinned on controlled feeds.
  */
class Scd2StreamSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.Sf

  /** Converge the emitted upsert stream: per (user_id, event_id) the
    * closed emission supersedes the open one (each event_id emits at
    * most one of each, so preference is order-free).
    */
  private def converge(rows: Seq[Scd2Row]): Map[(Long, Long), Scd2Row] =
    rows.groupBy(r => (r.user_id, r.event_id))
      .map { case (k, v) => k -> v.find(_.valid_to_ns.isDefined).getOrElse(v.head) }

  private def runStream(chunks: Seq[Seq[CdcStream.Change]], name: String): Seq[Scd2Row] = {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[CdcStream.Change]
    val q = Scd2Stream.scd2State(spark, input.toDS())
      .writeStream.format("memory").queryName(name).outputMode(OutputMode.Update).start()
    chunks.foreach { c => input.addData(c); q.processAllAvailable() }
    val out = spark.table(name).as[Scd2Row].collect().toSeq
    q.stop()
    out
  }

  test("converged stream equals the batch SCD2 history on the real feed, across micro-batches") {
    import spark.implicits._
    val feed = CdcOps.changeFeed(spark, sf)
      .withColumn("ts_ns", col("ts_ns").cast("long"))
      .select("event_id", "ts_ns", "user_id", "op", "event_type", "value")
      .as[CdcStream.Change].collect().sortBy(c => (c.ts_ns, c.event_id)).toSeq
    val chunks = feed.grouped(math.max(feed.size / 3, 1)).toSeq
    val got = converge(runStream(chunks, "scd2stream")).values.toSeq
      .map(r => (r.user_id, r.event_id, r.op, r.event_type,
        BigDecimal(r.value).setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble,
        r.valid_from_ns / 1000000000L,
        r.valid_to_ns.map(_ / 1000000000L), r.is_current)).toSet
    val want = CdcOps.scd2(spark, sf).collect().map { r =>
      (r.getLong(0), r.getLong(1), r.getString(2), r.getString(3),
        r.getDouble(4), r.getLong(5),
        if (r.isNullAt(6)) None else Some(r.getLong(6)), r.getBoolean(7))
    }.toSet
    assert(want.nonEmpty)
    assert(got === want)
  }

  test("a tombstone closes the open interval and leaves no current row; a re-insert resurrects") {
    val rows = converge(runStream(Seq(Seq(
      CdcStream.Change(1L, 100L, 7L, "c", "signup", 1.0),
      CdcStream.Change(2L, 200L, 7L, "d", "click", 2.0),
      CdcStream.Change(3L, 300L, 7L, "u", "view", 3.0))), "scd2tomb"))
    assert(rows.keySet === Set((7L, 1L), (7L, 3L)))
    assert(rows((7L, 1L)).valid_to_ns === Some(200L))
    assert(!rows((7L, 1L)).is_current)
    assert(rows((7L, 3L)).valid_to_ns === None && rows((7L, 3L)).is_current)
  }

  test("a late fact is emitted already closed at the open row's start, without splicing emitted history") {
    val rows = converge(runStream(Seq(
      Seq(CdcStream.Change(5L, 500L, 8L, "u", "click", 1.0)),
      Seq(CdcStream.Change(2L, 200L, 8L, "u", "view", 2.0))), "scd2late"))
    assert(rows((8L, 5L)).is_current && rows((8L, 5L)).valid_to_ns === None)
    assert(rows((8L, 2L)).valid_to_ns === Some(500L) && !rows((8L, 2L)).is_current)
  }
}
