package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.CurateStream

/** Pins the streaming ingest-time curation gate: stream ≡ the batch
  * pipeline's dedup → quality → bench-drop stages on a
  * planted-duplicate corpus, across micro-batch boundaries, with
  * duplicates arriving AFTER their canonical representatives.
  */
object CurateStreamSpec {
  case class CDoc(doc_id: Long, text: String, lang: String, source: String, n_chars: Long)
  case class CDocT(doc_id: Long, text: String, lang: String, source: String,
      n_chars: Long, ts: java.sql.Timestamp)
}

class CurateStreamSpec extends AnyFunSuite {
  import CurateStreamSpec.CDoc
  private lazy val spark = TestSpark.spark

  private def corpus: Seq[CDoc] = {
    import spark.implicits._
    val real = sources.Tables.documents(spark, TestSpark.Sf)
      .select($"doc_id", $"text", $"lang", $"source", $"n_chars")
      .as[CDoc].collect().toSeq.sortBy(_.doc_id)
    // planted duplicates: case/whitespace variants of real docs —
    // SAME normalized hash, HIGHER doc_id, arriving in later batches
    val dups = real.take(20).map(d =>
      d.copy(doc_id = d.doc_id + 1000000L,
        text = "  " + d.text.toUpperCase + "  ",
        n_chars = d.n_chars + 4))
    real ++ dups
  }

  test("stream equals the batch dedup→quality→bench gate across micro-batches") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val docs = corpus
    val w = operators.TextOps.lrWeights(spark, TestSpark.Sf)

    // batch truth over the SAME combined corpus: lowest doc_id per
    // normalized hash, then the trained gate, then the bench drop —
    // computed with the batch operators' own shared projection
    val batchBase = operators.CorpusOps.curateBase(docs.toDF())
    val w2 = org.apache.spark.sql.expressions.Window
      .partitionBy($"h").orderBy($"doc_id")
    val expected = batchBase
      .withColumn("rn", row_number().over(w2)).filter($"rn" === 1)
      .withColumn("p_quality", operators.TextOps.lrPm(w) / lit(1e6))
      .filter($"p_quality" >= 0.5 && !$"is_bench")
      .select($"doc_id", $"p_quality").as[(Long, Double)].collect().toSet
    assert(expected.nonEmpty)

    // stream the corpus in three batches: ten duplicates share a
    // batch WITH their canonical docs (the in-batch determinism case
    // — the keyed-state dedup must pick the lowest doc_id, where a
    // bare dropDuplicates keeps an arbitrary one), the other ten
    // arrive a batch AFTER theirs (the cross-batch state case)
    val (real, dups) = docs.partition(_.doc_id < 1000000L)
    val (inBatchDups, laterDups) = dups.splitAt(10)
    val batches = Seq(
      real.take(real.size / 2) ++ inBatchDups,
      real.drop(real.size / 2),
      laterDups)
    val input = MemoryStream[CDoc]
    val q = CurateStream.curated(input.toDF(), w)
      .writeStream.format("memory").queryName("curate_stream")
      .outputMode(OutputMode.Append).start()
    batches.foreach { b => input.addData(b); q.processAllAvailable() }
    q.stop()

    val got = spark.table("curate_stream")
      .select($"doc_id", $"p_quality").as[(Long, Double)].collect().toSet
    assert(got === expected, "stream diverged from the batch gate")
    // the planted duplicates must ALL be dropped (their canonical
    // representative arrived first), proving cross-batch dedup state
    assert(got.forall(_._1 < 1000000L))
  }

  test("a late LOWER-id duplicate is counted and logged, never silent") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val w = operators.TextOps.lrWeights(spark, TestSpark.Sf)
    val real = corpus.filter(_.doc_id < 1000000L).take(4)
    // the HIGH-id variant arrives FIRST; the true lowest-id canonical
    // doc lands a batch later — the one ordering the stream's
    // first-arrived rule cannot reconcile with the batch lowest-id rule
    val high = real.map(d => d.copy(doc_id = d.doc_id + 1000000L,
      text = "  " + d.text.toUpperCase + "  ", n_chars = d.n_chars + 4))

    val input = MemoryStream[CDoc]
    val (out, lateAcc) = streaming.CurateStream.curatedCounting(input.toDF(), w)
    val q = out.writeStream.format("memory").queryName("curate_late")
      .outputMode(OutputMode.Append).start()
    input.addData(high); q.processAllAvailable()
    input.addData(real); q.processAllAvailable()
    q.stop()

    // divergence observable: one counted late-lower arrival per pair
    assert(lateAcc.value === real.size.toLong,
      "late lower-id arrivals were not counted")
    // and the emitted winners are the first-arrived HIGH ids
    val got = spark.table("curate_late").select($"doc_id").as[Long].collect().toSet
    assert(got.forall(_ >= 1000000L))
  }

  test("horizon-bounded state: within-horizon dup drops, past-horizon dup re-admits") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import CurateStreamSpec.CDocT

    val w = operators.TextOps.lrWeights(spark, TestSpark.Sf)
    // a planted doc that PASSES the gate (long, stopword-y, unpunctuated)
    val passText = ("the quick brown fox jumps over a lazy dog and " * 12).trim
    def ts(sec: Long) = new java.sql.Timestamp(1700000000000L + sec * 1000L)
    val p0 = CDocT(10L, passText, "en", "web", passText.length.toLong, ts(0))
    val pIn = p0.copy(doc_id = 11L, text = "  " + passText.toUpperCase + "  ",
      n_chars = passText.length + 4L, ts = ts(30))           // inside 60s horizon
    val pPast = p0.copy(doc_id = 12L, ts = ts(130))          // past the horizon
    // watermark drivers with DISTINCT hashes
    val u1 = CDocT(90L, passText + " extra words one", "en", "web", 1L, ts(120))
    val u2 = CDocT(91L, passText + " extra words two", "en", "web", 1L, ts(125))

    val input = MemoryStream[CDocT]
    val q = streaming.CurateStream.curatedBounded(input.toDF(), w, horizonMs = 60000L)
      .writeStream.format("memory").queryName("curate_bounded")
      .outputMode(OutputMode.Append).start()
    // b1: representative → emitted; b2: within-horizon dup → dropped;
    // b3: watermark advances past the timeout; b4: key has no data, so
    // the timeout FIRES (state removed); b5: past-horizon dup → re-admit
    Seq(Seq(p0), Seq(pIn), Seq(u1), Seq(u2), Seq(pPast)).foreach { b =>
      input.addData(b); q.processAllAvailable()
    }
    q.stop()

    val got = spark.table("curate_bounded")
      .filter($"doc_id" < 50L).select($"doc_id").as[Long].collect().sorted.toSeq
    assert(got === Seq(10L, 12L),
      "expected the representative and the past-horizon re-admit, nothing else")
  }

  test("streaming funnel: cumulative counts equal the batch funnel across a restart") {
    import spark.implicits._

    val docs = corpus
    val w = operators.TextOps.lrWeights(spark, TestSpark.Sf)

    // batch truth over the SAME corpus, stage for stage (the
    // q_curate_funnel stages the stream owns), via the shared
    // curateBase projection — total, after_dedup, after_quality,
    // after_bench_drop
    val w2 = org.apache.spark.sql.expressions.Window
      .partitionBy($"h").orderBy($"doc_id")
    val flagged = operators.CorpusOps.curateBase(docs.toDF())
      .withColumn("d", row_number().over(w2) === 1)
      .withColumn("q", $"d" && operators.TextOps.lrPm(w) >= 500000L)
    val exp = flagged.agg(
        count(lit(1)), sum(when($"d", 1L).otherwise(0L)),
        sum(when($"q", 1L).otherwise(0L)),
        sum(when($"q" && !$"is_bench", 1L).otherwise(0L)))
      .as[(Long, Long, Long, Long)].collect()(0)
    val expected = Map(0L -> exp._1, 1L -> exp._2, 2L -> exp._3, 3L -> exp._4)

    // file feed + checkpoint so the SECOND half flows through a fresh
    // query that must resume both the dedup state and the stage
    // counters from the checkpoint
    val dir = java.nio.file.Files.createTempDirectory("curate_funnel_").toFile
    val feed = new java.io.File(dir, "feed"); feed.mkdirs()
    val ckpt = new java.io.File(dir, "ckpt").getAbsolutePath
    val latest = new java.util.concurrent.atomic.AtomicReference[Map[Long, Long]](Map.empty)
    def startQuery() = {
      val in = spark.readStream
        .schema("doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars BIGINT")
        .parquet(feed.getAbsolutePath)
      streaming.CurateStream.funnel(in, w)
        .writeStream.outputMode(OutputMode.Complete)
        .option("checkpointLocation", ckpt)
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
          latest.set(df.select($"stage_idx", $"n_docs").as[(Long, Long)]
            .collect().toMap)
        }
        .start()
    }
    // duplicates deliberately land in the SECOND run: their
    // representatives' dedup state must survive the restart for the
    // after_dedup count to stay correct
    val (h1, h2) = docs.partition(_.doc_id < 1000000L)
    h1.toDF().coalesce(1).write.mode("append").parquet(feed.getAbsolutePath)
    val q1 = startQuery(); q1.processAllAvailable(); q1.stop()
    h2.toDF().coalesce(1).write.mode("append").parquet(feed.getAbsolutePath)
    val q2 = startQuery(); q2.processAllAvailable(); q2.stop()

    assert(latest.get() === expected,
      "cumulative stream funnel diverged from the batch funnel")
  }
}
