package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.CdcStream
import graft.streaming.CdcStream.{Event, UserState}

class CdcStreamSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("streaming latest-state compaction matches upsert semantics across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val input = MemoryStream[Event]
    val q = CdcStream.latestState(spark, input.toDS())
      .writeStream.format("memory").queryName("latest").outputMode(OutputMode.Update).start()

    // batch 1: two users
    input.addData(
      Event(1L, 100L, 1L, "signup", 1.0),
      Event(2L, 200L, 1L, "click", 2.0),
      Event(3L, 150L, 2L, "view", 3.0))
    q.processAllAvailable()
    // batch 2: out-of-order event for user 1 (older — must NOT win),
    // newer event for user 2
    input.addData(
      Event(4L, 50L, 1L, "stale", 9.0),
      Event(5L, 500L, 2L, "purchase", 4.0))
    q.processAllAvailable()

    val states = spark.table("latest").as[UserState].collect()
      .groupBy(_.user_id).map { case (k, v) => k -> v.maxBy(_.n_events) }
    q.stop()

    assert(states(1L).last_event_id === 2L) // stale event ignored
    assert(states(1L).last_type === "click")
    assert(states(1L).n_events === 3L)
    assert(states(2L).last_event_id === 5L)
    assert(states(2L).last_type === "purchase")
  }

  test("watermarked windowed counts run over a bounded stream") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val base = 1704067200L * 1000000000L // 2024-01-01 00:00 UTC in ns
    val input = MemoryStream[Event]
    val q = CdcStream.windowedCounts(input.toDF())
      .writeStream.format("memory").queryName("winagg").outputMode(OutputMode.Update).start()
    input.addData(
      Event(1L, base + 1L, 1L, "click", 1.0),
      Event(2L, base + 10L * 60 * 1000000000L, 2L, "click", 2.0),
      Event(3L, base + 70L * 60 * 1000000000L, 1L, "view", 3.0))
    q.processAllAvailable()
    val rows = spark.table("winagg").collect()
    q.stop()
    assert(rows.nonEmpty)
    val clicks = rows.filter(_.getString(1) == "click")
    assert(clicks.map(_.getLong(2)).sum === 2L)
  }
}
