package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.{CdcStream, NearDupStream}

/** Pins the streaming LSH candidate generator: (1) its JVM-side band
  * keys are bit-for-bit the batch Column pipeline's band keys, (2) the
  * owner-star emission covers exactly the batch buckets' membership
  * (same connected components as the batch pair clique), and (3) batch
  * boundaries don't change the emitted set when arrivals stay ordered.
  */
class NearDupStreamSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def corpus: Array[(Long, String)] = {
    import spark.implicits._
    sources.Tables.documents(spark, TestSpark.Sf)
      .select($"doc_id", $"text").as[(Long, String)].collect()
  }

  test("JVM band keys mirror the Column pipeline bit for bit") {
    import spark.implicits._
    // corpus docs PLUS tokenizer edge cases: Spark's split keeps
    // trailing/interior empty tokens, so the mirror must too
    val edge = Seq(
      (900001L, "alpha beta gamma delta "),
      (900002L, "alpha  beta gamma"),
      (900003L, "alpha beta gamma delta"))
      .toDF("doc_id", "text")
    val docs = sources.Tables.documents(spark, TestSpark.Sf).select($"doc_id", $"text")
      .unionByName(edge)
    val sh = array_distinct(functions.Hashing.shingles(split($"text", " "), NearDupStream.ShingleK))
    val colKeys = docs
      .withColumn("sh", sh).filter(size($"sh") > 0)
      .select($"doc_id", array((0 until NearDupStream.Bands).map(b =>
        functions.Hashing.bandKey($"sh", b, NearDupStream.Rows)): _*).as("keys"))
      .as[(Long, Seq[String])].collect()
      .map { case (id, ks) => id -> ks.distinct.toSet }.toMap
    val jvmKeys = docs.as[(Long, String)].collect()
      .map { case (id, t) => id -> NearDupStream.bandKeys(t).toSet }
      .filter(_._2.nonEmpty).toMap
    assert(jvmKeys === colKeys)
    // the trailing-space doc must bucket DIFFERENTLY from its trimmed
    // twin (the empty token changes the final shingles) — if the
    // mirror dropped trailing tokens these would collide on all bands
    assert(jvmKeys(900001L) !== jvmKeys(900003L))
  }

  test("bucket-owner state survives a checkpoint restart: late collisions pair with the original owner") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("neardup").toFile
    val feed = new java.io.File(dir, "feed"); feed.mkdirs()
    val ckpt = new java.io.File(dir, "ckpt").getAbsolutePath
    val out = new java.io.File(dir, "out").getAbsolutePath

    def feedFile(rows: Seq[(Long, String)]): Unit =
      rows.toDF("doc_id", "text")
        .coalesce(1).write.mode("append").parquet(feed.getAbsolutePath)

    def startQuery() = {
      val docs = spark.readStream.schema("doc_id BIGINT, text STRING")
        .parquet(feed.getAbsolutePath).as[CdcStream.Doc]
      NearDupStream.candidates(spark, docs)
        .writeStream.outputMode(org.apache.spark.sql.streaming.OutputMode.Update)
        .option("checkpointLocation", ckpt)
        .foreachBatch {
          (ds: org.apache.spark.sql.Dataset[NearDupStream.Cand], _: Long) =>
            ds.write.mode("append").parquet(out)
        }
        .start()
    }

    val text = "alpha beta gamma delta epsilon"
    val nBands = NearDupStream.bandKeys(text).size

    // phase 1: the owner and one collider, then the stream goes down
    feedFile(Seq((1L, text), (5L, text)))
    val q1 = startQuery(); q1.processAllAvailable(); q1.stop()

    // phase 2: a late collider lands while the stream is down; restart
    // from the checkpoint — it must pair with the PHASE-1 owner (a
    // lost state store would crown doc 9 a fresh owner and emit
    // nothing; a re-read of phase-1 input would duplicate its pairs)
    feedFile(Seq((9L, text)))
    val q2 = startQuery(); q2.processAllAvailable(); q2.stop()

    val cands = spark.read.parquet(out).as[NearDupStream.Cand].collect()
    assert(cands.length === 2 * nBands)
    assert(cands.forall(_.owner_id == 1L))
    assert(cands.count(_.doc_id == 5L) === nBands)
    assert(cands.count(_.doc_id == 9L) === nBands)
  }

  test("owner-star emission equals min-owner stars over the batch buckets; batch-boundary invariant") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val docs = corpus.map { case (id, t) => CdcStream.Doc(id, t) }.sortBy(_.doc_id)

    def run(batches: Seq[Seq[CdcStream.Doc]], name: String): Set[(String, Long, Long)] = {
      val input = MemoryStream[CdcStream.Doc]
      val q = NearDupStream.candidates(spark, input.toDS())
        .writeStream.format("memory").queryName(name)
        .outputMode(OutputMode.Update).start()
      batches.foreach { b => input.addData(b); q.processAllAvailable() }
      q.stop()
      spark.table(name)
        .select($"band_key", $"owner_id", $"doc_id")
        .as[(String, Long, Long)].collect().toSet
    }

    // expected: per band bucket with members D (|D| >= 2), the star
    // {(min(D), d) : d != min(D)} — owner = global min because the
    // feed is doc_id-ordered
    val expected = docs
      .flatMap(d => NearDupStream.bandKeys(d.text).map(k => (k, d.doc_id)))
      .groupBy(_._1).view.mapValues(_.map(_._2).distinct.sorted).toMap
      .filter(_._2.size >= 2).toSeq
      .flatMap { case (k, ds) => ds.tail.map(d => (k, ds.head, d)) }.toSet

    val oneBatch = run(Seq(docs.toSeq), "nds_one")
    assert(oneBatch === expected)
    assert(oneBatch.nonEmpty)

    val (b1, b2) = docs.toSeq.splitAt(docs.length / 2) // ordered split
    assert(run(Seq(b1, b2), "nds_two") === expected,
      "batch boundary changed the candidate set")
  }
}
