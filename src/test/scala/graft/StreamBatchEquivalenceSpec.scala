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
}
