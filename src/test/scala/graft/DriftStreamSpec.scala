package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.DriftStream

/** Pins the streaming drift monitor: readout(stored base histogram,
  * live Complete-mode histogram) ≡ the registered q_drift_psi batch
  * readout on the same halves, across micro-batch boundaries and a
  * checkpoint restart, with the alert firing live on a planted shift.
  */
object DriftStreamSpec {
  case class DDoc(doc_id: Long, text: String, lang: String, source: String,
      n_chars: Long)
}

class DriftStreamSpec extends AnyFunSuite {
  import DriftStreamSpec.DDoc
  private lazy val spark = TestSpark.spark

  private def corpus: Seq[DDoc] = {
    import spark.implicits._
    sources.Tables.documents(spark, TestSpark.Sf)
      .select($"doc_id", $"text", $"lang", $"source", $"n_chars")
      .as[DDoc].collect().toSeq.sortBy(_.doc_id)
  }

  test("stream ≡ the registered batch readout on the gate corpus across three micro-batches") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val docs = corpus
    // the batch query's exact halves: the overflow-safe integer midpoint
    val ids = docs.map(_.doc_id)
    val cut = ids.min + (ids.max - ids.min) / 2
    val (base, delta) = docs.partition(_.doc_id <= cut)
    val expected = operators.CorpusOps.driftPsi(spark, TestSpark.Sf)
      .collect().map(_.toSeq).toSeq

    val baseHist = DriftStream.baseHistogram(base.toDF())
    val input = MemoryStream[DDoc]
    val q = DriftStream.histogram(input.toDF())
      .writeStream.format("memory").queryName("drift_stream")
      .outputMode(OutputMode.Complete).start()
    delta.grouped(math.max(1, delta.size / 3 + 1)).foreach { b =>
      input.addData(b); q.processAllAvailable()
    }
    q.stop()
    val got = DriftStream.readout(baseHist, spark.table("drift_stream"))
      .collect().map(_.toSeq).toSeq
    assert(got === expected, "streaming monitor diverged from the batch readout")
  }

  test("checkpoint restart: the live histogram resumes and the readout stays ≡ batch") {
    import spark.implicits._
    val docs = corpus
    val ids = docs.map(_.doc_id)
    val cut = ids.min + (ids.max - ids.min) / 2
    val (base, delta) = docs.partition(_.doc_id <= cut)
    val expected = operators.CorpusOps.driftPsiFrom(docs.toDF())
      .collect().map(_.toSeq).toSeq

    val dir = java.nio.file.Files.createTempDirectory("drift_stream_").toFile
    val feed = new java.io.File(dir, "feed"); feed.mkdirs()
    val ckpt = new java.io.File(dir, "ckpt").getAbsolutePath
    val latest = new java.util.concurrent.atomic.AtomicReference[Seq[Seq[Any]]](Nil)
    def startQuery() = {
      val in = spark.readStream
        .schema("doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars BIGINT")
        .parquet(feed.getAbsolutePath)
      DriftStream.histogram(in)
        .writeStream.outputMode(OutputMode.Complete)
        .option("checkpointLocation", ckpt)
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
          latest.set(df.collect().map(_.toSeq).toSeq)
        }
        .start()
    }
    val (h1, h2) = delta.splitAt(delta.size / 2)
    h1.toDF().coalesce(1).write.mode("append").parquet(feed.getAbsolutePath)
    val q1 = startQuery(); q1.processAllAvailable(); q1.stop()
    h2.toDF().coalesce(1).write.mode("append").parquet(feed.getAbsolutePath)
    val q2 = startQuery(); q2.processAllAvailable(); q2.stop()

    import spark.implicits._
    val live = latest.get().map(r =>
      (r(0).asInstanceOf[String], r(1).asInstanceOf[String], r(2).asInstanceOf[Long]))
      .toDF("feature", "bin", "n_d")
    val got = DriftStream.readout(DriftStream.baseHistogram(base.toDF()), live)
      .collect().map(_.toSeq).toSeq
    assert(got === expected, "restarted monitor diverged from the batch readout")
  }

  test("the alert fires live on a planted shift: base en, feed fr") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val text = "ten short words make up this deterministic document body x"
    val base = (1L to 100L).map(i => DDoc(i, text, "en", "web", 58L))
    val feed = (101L to 200L).map(i => DDoc(i, text, "fr", "web", 58L))
    val input = MemoryStream[DDoc]
    val q = DriftStream.histogram(input.toDF())
      .writeStream.format("memory").queryName("drift_alert")
      .outputMode(OutputMode.Complete).start()
    input.addData(feed); q.processAllAvailable()
    q.stop()
    val out = DriftStream.readout(
        DriftStream.baseHistogram(base.toDF()), spark.table("drift_alert"))
      .collect().map(r => r.getString(0) -> r.getBoolean(5)).toMap
    assert(out("lang"), "a full lang swap must trip the live alert")
    Seq("len_chars", "n_tokens", "mean_word_len_x4", "source")
      .foreach(f => assert(!out(f), f))
  }
}
