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
