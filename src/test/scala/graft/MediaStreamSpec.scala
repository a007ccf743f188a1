package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.MediaStream

/** Pins the streaming media ingest gate: stream ≡ the batch
  * q_rle_frames pipeline row-for-row across micro-batch boundaries on
  * a clean corpus, poison blobs dead-lettered with their reason while
  * healthy blobs in the SAME batch flow through, and the cumulative
  * health telemetry counting documents exactly.
  */
class MediaStreamSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("stream decode equals the batch q_rle_frames rows across micro-batches") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val docs = sources.Tables.documents(spark, TestSpark.Sf)
      .filter(length(col("text")) > 0)
      .select(col("doc_id").cast("long"), col("text"))
      .as[MediaStream.Doc].collect().toSeq.sortBy(_.doc_id)
    val expected = operators.MultimodalOps.rleFrames(spark, TestSpark.Sf)
      .collect().map(_.toSeq).toSet
    assert(expected.nonEmpty)

    val input = MemoryStream[MediaStream.Doc]
    val q = MediaStream.features(MediaStream.decoded(input.toDS()))
      .writeStream.format("memory").queryName("media_stream")
      .outputMode(OutputMode.Append).start()
    docs.grouped(math.max(docs.size / 3, 1)).foreach { b =>
      input.addData(b); q.processAllAvailable()
    }
    q.stop()

    val got = spark.table("media_stream").collect().map(_.toSeq).toSet
    assert(got === expected, "stream features diverged from the batch pipeline")
  }

  test("poison blobs dead-letter with a reason; healthy blobs in the same batch flow") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val batch = Seq(
      MediaStream.Doc(1L, "a healthy little document body"),
      MediaStream.Doc(2L, "café au lait"), // non-ASCII: synth refuses
      MediaStream.Doc(3L, ""),             // empty: synth refuses
      MediaStream.Doc(4L, "another healthy document"))

    val input = MemoryStream[MediaStream.Doc]
    val out = MediaStream.decoded(input.toDS())
    val qf = MediaStream.features(out)
      .writeStream.format("memory").queryName("media_ok")
      .outputMode(OutputMode.Append).start()
    val qd = MediaStream.deadLetters(out)
      .writeStream.format("memory").queryName("media_dead")
      .outputMode(OutputMode.Append).start()
    input.addData(batch)
    qf.processAllAvailable(); qd.processAllAvailable()
    qf.stop(); qd.stop()

    val okDocs = spark.table("media_ok").select("doc_id").as[Long].collect().toSet
    assert(okDocs === Set(1L, 4L), "healthy docs must decode despite the poison rows")
    val dead = spark.table("media_dead").as[(Long, String)].collect().toMap
    assert(dead.keySet === Set(2L, 3L))
    assert(dead(2L).contains("ASCII"), s"reason must name the failure: ${dead(2L)}")
    assert(dead(3L).contains("non-empty"), s"reason must name the failure: ${dead(3L)}")
  }

  test("health telemetry: cumulative ok/dead document counts and the rate") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val input = MemoryStream[MediaStream.Doc]
    val q = MediaStream.health(MediaStream.decoded(input.toDS()))
      .writeStream.format("memory").queryName("media_health")
      .outputMode(OutputMode.Complete).start()
    input.addData(Seq(
      MediaStream.Doc(1L, "one fine blob"), MediaStream.Doc(2L, "schön")))
    q.processAllAvailable()
    input.addData(Seq(MediaStream.Doc(3L, "x" * 200))) // 4 frames, still ONE doc
    q.processAllAvailable()
    q.stop()

    val Array(row) = spark.table("media_health").collect()
    assert(row.getLong(0) === 2L, "ok docs counted per document, not per frame")
    assert(row.getLong(1) === 1L)
    assert(row.getDouble(2) === math.rint(1.0 / 3.0 * 1e6) / 1e6)

    // the gate's FIRST trigger may fire before any document arrives:
    // the health row must read (0, 0, 0.0), never nulls (same code
    // path batch/stream — evaluate on an empty frame)
    val Array(empty) = MediaStream.health(
      MediaStream.decoded(spark.emptyDataset[MediaStream.Doc])).collect()
    assert(empty.getLong(0) === 0L && empty.getLong(1) === 0L
      && empty.getDouble(2) === 0.0)
  }
}
