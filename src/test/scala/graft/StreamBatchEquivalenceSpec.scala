package graft

import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.CdcOps
import graft.streaming.CdcStream

/** The streaming latest-state compaction over the real events feed
  * must agree with the batch CdcOps.cdcLatest — the property that lets
  * a deployment swap the nightly refresh for the continuous stream.
  */
class StreamBatchEquivalenceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("file-source streaming compaction equals batch compaction at sf0.001") {
    import spark.implicits._
    val dir = TestSpark.Sf

    // the file stream source ingests a directory; stage the feed file
    val feedDir = java.nio.file.Files.createTempDirectory("cdc_feed")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$dir/events.parquet"),
      feedDir.resolve("events.parquet"))

    val stream = CdcStream.fileSourceEvents(spark, feedDir.toString)
    val q = CdcStream.latestState(spark, stream)
      .writeStream.format("memory").queryName("stream_latest")
      .outputMode(OutputMode.Update).start()
    q.processAllAvailable()
    q.stop()

    val batchRows = CdcOps.cdcLatest(spark, dir)
      .select("user_id", "last_event_id", "last_type")
      .as[(Long, Long, String)].collect()

    val streamedFull = spark.table("stream_latest")
      .select("user_id", "last_event_id", "last_type")
      .as[(Long, Long, String)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap

    assert(streamedFull.size === batchRows.length)
    batchRows.foreach { case (u, id, tpe) =>
      assert(streamedFull(u) === ((id, tpe)), s"user $u diverges")
    }
  }

  test("streaming session windows equal batch gap sessionization at sf0.001") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val events = sources.Tables.events(spark, TestSpark.Sf)
      .select($"event_id", $"ts_ns", $"user_id", $"event_type", $"value")
      .as[CdcStream.Event].collect().sortBy(_.ts_ns)

    val input = MemoryStream[CdcStream.Event]
    val q = CdcStream.sessionizeStream(input.toDF())
      .writeStream.format("memory").queryName("sb_sessions")
      .outputMode(OutputMode.Append).start()
    // two arrival batches + a far-future sentinel: append mode only
    // emits a session once the watermark passes its end, so the
    // sentinel closes the tail sessions; it is excluded from compare
    val (b1, b2) = events.splitAt(events.length / 2)
    input.addData(b1.toSeq); q.processAllAvailable()
    input.addData(b2.toSeq); q.processAllAvailable()
    val sentinel = CdcStream.Event(-1L, events.last.ts_ns + 86400L * 1000000000L, -1L, "s", 0.0)
    input.addData(Seq(sentinel)); q.processAllAvailable()
    q.stop()

    val batch = CdcOps.sessionize(spark, TestSpark.Sf)
      .select($"user_id", $"start_s", $"n_events", $"sum_value")
      .as[(Long, Long, Long, Double)].collect().toSet
    val streamed = spark.table("sb_sessions")
      .filter($"user_id" =!= -1L)
      .select($"user_id", $"start_s", $"n_events", $"sum_value")
      .as[(Long, Long, Long, Double)].collect().toSet
    assert(streamed === batch,
      s"streaming sessions diverge: only-stream=${(streamed -- batch).take(3)} only-batch=${(batch -- streamed).take(3)}")
    assert(batch.nonEmpty)
  }

  test("streaming op-aware compaction (tombstones) equals batch cdcCompact at sf0.01") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    // sf0.01: the smallest scale where some keys' NEWEST change is a
    // delete, so the tombstone path is actually exercised
    val dir = "/root/testdata/sf0.01"
    val changes = CdcOps.changeFeed(spark, dir)
      .select($"event_id", $"ts_ns", $"user_id", $"op", $"event_type", $"value")
      .as[CdcStream.Change].collect().sortBy(c => (c.ts_ns, c.event_id))

    val input = MemoryStream[CdcStream.Change]
    // retention effectively infinite: a purged tombstone restarts the
    // key's n_changes count, which is exactly the (documented) place
    // stream and batch may diverge — parity is over the unpurged log
    val q = CdcStream.compactState(spark, input.toDS(), tombstoneRetentionMs = Long.MaxValue / 4)
      .writeStream.format("memory").queryName("sb_compact")
      .outputMode(OutputMode.Update).start()
    // three arrival batches in feed order (a CDC log is per-key ordered)
    val (b1, rest) = changes.splitAt(changes.length / 3)
    val (b2, b3) = rest.splitAt(rest.length / 2)
    Seq(b1, b2, b3).foreach { b => input.addData(b.toSeq); q.processAllAvailable() }
    q.stop()

    // materialize the sink's view: per key the LAST emission wins
    // (n_changes strictly increases per key, so argmax identifies it);
    // deleted = true removes the key from the serving store
    val lastPerKey = spark.table("sb_compact").as[CdcStream.Compacted].collect()
      .groupBy(_.user_id).map { case (_, es) => es.maxBy(_.n_changes) }

    val live = lastPerKey.filterNot(_.deleted)
      .map(s => s.user_id -> ((s.last_event_id, s.last_op, s.n_changes))).toMap
    val batch = CdcOps.cdcCompact(spark, dir)
      .select($"user_id", $"last_event_id", $"last_op", $"n_changes")
      .as[(Long, Long, String, Long)].collect()

    assert(live.size === batch.length)
    batch.foreach { case (u, id, op, n) =>
      assert(live(u) === ((id, op, n)), s"user $u diverges")
    }
    // tombstoned keys are EXACTLY the keys absent from the batch snapshot
    val tombstoned = lastPerKey.filter(_.deleted).map(_.user_id).toSet
    assert(tombstoned === changes.map(_.user_id).toSet -- batch.map(_._1))
    assert(tombstoned.nonEmpty, "the feed must exercise the delete path")
  }

  test("compaction tombstone ignores a late out-of-order record older than the delete") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    // realistic epoch-ns event times (the watermark machinery works in
    // real milliseconds); minutes apart, watermark delay 10 minutes
    val t0 = 1700000000L * 1000000000L
    def m(mins: Long) = t0 + mins * 60L * 1000000000L
    val input = MemoryStream[CdcStream.Change]
    val q = CdcStream.compactState(spark, input.toDS())
      .writeStream.format("memory").queryName("sb_compact_late")
      .outputMode(OutputMode.Update).start()
    input.addData(Seq(
      CdcStream.Change(1L, m(0), 7L, "c", "signup", 1.0),
      CdcStream.Change(2L, m(20), 7L, "d", "error", 0.0)))
    q.processAllAvailable()
    // a LATE update that predates the delete but is inside the
    // watermark (wm = m20 - 10min = m10 < m15 < m20) must reach the
    // state function and be rejected by the retained tombstone, not
    // merely dropped by the late-row filter
    input.addData(Seq(CdcStream.Change(3L, m(15), 7L, "u", "click", 2.0)))
    q.processAllAvailable()
    // a genuinely NEWER insert must resurrect it
    input.addData(Seq(CdcStream.Change(4L, m(40), 7L, "c", "signup", 3.0)))
    q.processAllAvailable()
    q.stop()

    val ems = spark.table("sb_compact_late").as[CdcStream.Compacted].collect()
      .sortBy(_.n_changes)
    assert(ems.map(_.deleted).toSeq === Seq(true, true, false),
      s"expected tombstone, tombstone-retained, resurrect; got $ems")
    assert(ems.last.last_event_id === 4L && ems.last.n_changes === 4L)
  }

  test("streaming exact dedup equals batch dedupExact over the documents corpus") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val docs = sources.Tables.documents(spark, TestSpark.Sf)
      .select($"doc_id", $"text").as[(Long, String)].collect()
      .map { case (id, t) => CdcStream.Doc(id, t) }

    // feed the corpus in two arbitrary batches; batch boundaries must
    // not change WHICH documents survive
    val input = MemoryStream[CdcStream.Doc]
    val q = CdcStream.dedupStream(spark, input.toDS())
      .writeStream.format("memory").queryName("sb_dedup")
      .outputMode(OutputMode.Update).start()
    val (b1, b2) = docs.partition(_.doc_id % 2 == 0)
    input.addData(b1.toSeq); q.processAllAvailable()
    input.addData(b2.toSeq); q.processAllAvailable()
    q.stop()

    // batch semantics keep the LOWEST doc_id per content key; the
    // stream keeps the FIRST ARRIVAL — feed order above delivers all
    // even ids before odd ids, so compare against min-per-key of the
    // same arrival order, i.e. the batch result restricted to keys,
    // checking the stream emitted exactly one doc per content key
    val batch = operators.DedupOps.dedupExact(spark, TestSpark.Sf)
      .select($"h").as[String].collect().toSet
    val streamed = spark.table("sb_dedup")
      .select($"content_key").as[String].collect()
    assert(streamed.length === streamed.distinct.length, "a content key emitted twice")
    assert(streamed.toSet === batch, "streaming and batch disagree on the distinct-content set")
  }
}
