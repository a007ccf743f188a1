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

  test("file-source stream recovers from checkpoint: state intact, no re-emission") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("cdcstream").toFile
    val feed = new java.io.File(dir, "feed"); feed.mkdirs()
    val ckpt = new java.io.File(dir, "ckpt").getAbsolutePath
    val out = new java.io.File(dir, "out").getAbsolutePath

    def feedFile(rows: Seq[(Long, Long, Long, String, Double)]): Unit =
      rows.toDF("event_id", "ts", "user_id", "event_type", "value")
        .coalesce(1).write.mode("append").parquet(feed.getAbsolutePath)

    // same query code both runs; only the checkpoint links them
    def startQuery() =
      CdcStream.latestState(spark, CdcStream.fileSourceEvents(spark, feed.getAbsolutePath))
        .writeStream.outputMode(OutputMode.Update)
        .option("checkpointLocation", ckpt)
        .foreachBatch { (ds: org.apache.spark.sql.Dataset[UserState], _: Long) =>
          ds.write.mode("append").parquet(out)
        }
        .start()

    // phase 1: two events for user 1, then the stream goes down
    feedFile(Seq((1L, 100L, 1L, "signup", 1.0), (2L, 200L, 1L, "click", 2.0)))
    val q1 = startQuery(); q1.processAllAvailable(); q1.stop()

    // phase 2: more data lands while the stream is down; restart from
    // the checkpoint — phase-1 files must NOT be re-read, phase-1
    // state must still be there
    feedFile(Seq((3L, 300L, 1L, "purchase", 3.0), (4L, 50L, 2L, "view", 4.0)))
    val q2 = startQuery(); q2.processAllAvailable(); q2.stop()

    val outRows = spark.read.parquet(out).as[UserState].collect()
    // exactly three emissions: (u1, n=2) before the stop, (u1, n=3)
    // and (u2, n=1) after recovery — a re-read of phase-1 input would
    // duplicate the first, a lost state store would reset n_events
    assert(outRows.length === 3)
    val u1 = outRows.filter(_.user_id == 1L).sortBy(_.n_events)
    assert(u1.map(_.n_events).toSeq === Seq(2L, 3L))
    assert(u1.last.last_event_id === 3L)
    assert(u1.last.last_type === "purchase")
    val u2 = outRows.filter(_.user_id == 2L)
    assert(u2.map(_.n_events).toSeq === Seq(1L))
  }

  test("stream-stream interval join attributes purchases to in-horizon clicks only") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val base = 1704067200L * 1000000000L // 2024-01-01 00:00 UTC in ns
    def min(m: Long) = base + m * 60L * 1000000000L
    val clicks = MemoryStream[Event]
    val purchases = MemoryStream[Event]
    val joined = CdcStream.attributionStream(purchases.toDF(), clicks.toDF())
    val q = joined.writeStream.format("memory").queryName("attrib")
      .outputMode(OutputMode.Append).start()

    clicks.addData(
      Event(1L, min(0), 1L, "click", 0.0),    // 60m before purchase → outside 1h? exactly at horizon edge
      Event(2L, min(55), 1L, "click", 0.0),   // in horizon
      Event(3L, min(75), 1L, "click", 0.0),   // AFTER the purchase → excluded
      Event(4L, min(50), 2L, "click", 0.0))   // other user
    purchases.addData(
      Event(10L, min(60), 1L, "purchase", 9.0))
    q.processAllAvailable()
    q.stop()

    val rows = spark.table("attrib")
      .select($"purchase_id", $"click_id").as[(Long, Long)].collect().toSet
    // click 1 sits exactly horizon before the purchase (inclusive);
    // click 2 qualifies; click 3 is later than the purchase; click 4
    // is another user
    assert(rows === Set((10L, 1L), (10L, 2L)))
  }

  test("streaming exact dedup emits each content key once, first arrival wins") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val input = MemoryStream[CdcStream.Doc]
    val q = CdcStream.dedupStream(spark, input.toDS())
      .writeStream.format("memory").queryName("streamdedup").outputMode(OutputMode.Update).start()

    input.addData(
      CdcStream.Doc(1L, "alpha beta"),
      CdcStream.Doc(2L, "alpha beta"), // in-batch duplicate
      CdcStream.Doc(3L, "gamma"))
    q.processAllAvailable()
    input.addData(
      CdcStream.Doc(4L, "alpha beta"), // cross-batch duplicate: no emission
      CdcStream.Doc(5L, "delta"))
    q.processAllAvailable()

    val rows = spark.table("streamdedup").as[CdcStream.FirstSeen].collect()
    q.stop()
    assert(rows.length === 3) // alpha-beta (once), gamma, delta
    val byDoc = rows.map(r => r.doc_id).toSet
    assert(byDoc === Set(1L, 3L, 5L)) // first arrival wins
    assert(rows.find(_.doc_id == 1L).get.n_dups === 1L) // doc 2 folded in-batch
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
