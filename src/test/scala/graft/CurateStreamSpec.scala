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
      .withColumn("p_quality", operators.TextOps.lrP(w))
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
}
