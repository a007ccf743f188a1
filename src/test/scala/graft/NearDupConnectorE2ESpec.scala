package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.DedupOps
import graft.streaming.{CdcStream, NearDupStream, UpsertSink}

/** The WHOLE streaming near-dup connector, composed: docs landing as
  * files → NearDupStream.candidates (owner-star LSH state) →
  * foreachBatch(DedupOps.verifyPairs — the batch pipeline's OWN exact
  * verify stage) → UpsertSink pair store. The streaming twin of
  * StreamingConnectorE2ESpec, proving across a mid-stream restart:
  *
  *  - VERIFIED stream pairs never leave the batch q_dedup_minhash pair
  *    set, and carry identical jaccard values (same shingle
  *    arithmetic, same threshold — the shared verify stage);
  *  - the near-dup CLUSTERS agree: connected components of the
  *    verified star equal components of the batch pair clique (the
  *    star's contract — downstream dedup consumes components, and the
  *    owner connects every bucket member);
  *  - the pair store is exactly-once under foreachBatch replay and
  *    heals a crash between snapshot write and commit marker.
  *
  * Each stage is spec-proven alone (NearDupStreamSpec, UpsertSinkSpec,
  * the dedup suite); this spec proves they compose.
  */
class NearDupConnectorE2ESpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** Union-find components over a pair set, labeled by min member. */
  private def components(pairs: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    parent.keys.map(k => k -> find(k)).toMap
  }

  test("file docs → candidates → shared exact verify → pair store equals batch minhash clusters, with restart, replay and crash healing") {
    import spark.implicits._
    // sf0.01: smallest scale where the batch minhash pair set is
    // non-empty (sf0.001 legitimately produces zero pairs)
    val dir = "/root/testdata/sf0.01"
    val docsDf = sources.Tables.documents(spark, dir).select($"doc_id", $"text")

    val tmp = Files.createTempDirectory("neardup_e2e").toFile
    val feed = new java.io.File(tmp, "feed"); feed.mkdirs()
    val ckpt = new java.io.File(tmp, "ckpt").getAbsolutePath
    val store = new java.io.File(tmp, "store").getAbsolutePath

    // ---- the verified-pair upsert: pair-keyed rows in the sink's
    // (user_id, last_ts_ns, last_event_id, deleted) envelope
    val captured = scala.collection.mutable.ArrayBuffer.empty[(Long, Seq[Row], DataFrame)]
    def applyVerified(cands: DataFrame, batchId: Long): Unit = {
      val verified = DedupOps.verifyPairs(
          cands.select($"owner_id".as("d1"), $"doc_id".as("d2")), docsDf)
        .withColumn("user_id", $"d1" * 1000000L + $"d2") // pair key
        .withColumn("last_ts_ns", lit(batchId))
        .withColumn("last_event_id", lit(batchId))
        .withColumn("deleted", lit(false))
      captured += ((batchId, verified.collect().toSeq, verified))
      UpsertSink.applyBatch(spark, store)(verified, batchId)
    }

    def startQuery() = {
      val docs = spark.readStream.schema("doc_id BIGINT, text STRING")
        .parquet(feed.getAbsolutePath).as[CdcStream.Doc]
      NearDupStream.candidates(spark, docs)
        .writeStream.outputMode(org.apache.spark.sql.streaming.OutputMode.Update)
        .option("checkpointLocation", ckpt)
        .foreachBatch { (ds: org.apache.spark.sql.Dataset[NearDupStream.Cand], id: Long) =>
          applyVerified(ds.toDF(), id)
        }
        .start()
    }

    // ---- drive: ordered corpus over two arrivals with a full stream
    // restart between them (owner state must come from the checkpoint)
    val all = docsDf.as[(Long, String)].collect().sortBy(_._1)
    val (h1, h2) = all.splitAt(all.length / 2)
    h1.toSeq.toDF("doc_id", "text").coalesce(1)
      .write.mode("append").parquet(feed.getAbsolutePath)
    val q1 = startQuery(); q1.processAllAvailable(); q1.stop()
    h2.toSeq.toDF("doc_id", "text").coalesce(1)
      .write.mode("append").parquet(feed.getAbsolutePath)
    val q2 = startQuery(); q2.processAllAvailable(); q2.stop()

    def storePairs() = UpsertSink.read(spark, store).get
      .select($"d1", $"d2", $"jac").as[(Long, Long, Double)].collect().toSet
    val streamed = storePairs()

    // ---- batch truth
    val batch = DedupOps.dedupMinhash(spark, dir)
      .as[(Long, Long, Double)].collect().toSet
    assert(batch.nonEmpty, "batch minhash pairs empty at sf0.01 — corpus changed?")
    assert(streamed.nonEmpty)

    // verified star ⊆ batch clique, identical jaccard per pair
    assert(streamed.subsetOf(batch),
      s"stream invented pairs: ${streamed -- batch}")
    // same components: the star spans the batch clusters
    val sc = components(streamed.toSeq.map(p => (p._1, p._2)))
    val bc = components(batch.toSeq.map(p => (p._1, p._2)))
    assert(sc === bc, "stream components diverge from batch components")

    // ---- replay: re-driving the last committed micro-batch is a no-op
    val (lastId, rows, proto) = captured.filter(_._2.nonEmpty).last
    val replayDf = spark.createDataFrame(
      scala.jdk.CollectionConverters.SeqHasAsJava(rows).asJava, proto.schema)
    val committedBefore = UpsertSink.committedBatches(spark, store)
    UpsertSink.applyBatch(spark, store)(replayDf, lastId)
    assert(storePairs() === streamed)
    assert(UpsertSink.committedBatches(spark, store) === committedBefore)

    // ---- crash healing: marker lost after snapshot write, replay heals
    Files.delete(Paths.get(s"$store/_commits/$lastId"))
    UpsertSink.applyBatch(spark, store)(replayDf, lastId)
    assert(storePairs() === streamed)
    assert(UpsertSink.committedBatches(spark, store) === committedBefore)
  }
}
