package graft

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{CdcOps, Ivm}
import graft.streaming.{CdcStream, IvmSink}

/** The streaming IVM pipeline, composed end to end: the change feed
  * landing as files → CdcStream.compactState (op-aware keyed deltas)
  * → foreachBatch(IvmSink.applyBatch: Ivm.maintainView (+/−)
  * adjustments into a versioned state+view store) — a continuously
  * maintained aggregate view under at-least-once delivery. Proves,
  * across a full mid-stream restart (state from the checkpoint) and a
  * replayed micro-batch (commit-marker no-op):
  *
  *  - the served view over the whole feed equals the batch
  *    q_cdc_incremental_view (the swap-the-nightly-refresh contract);
  *  - the maintained state equals the batch compaction;
  *  - a replayed batch does not double-apply its (+/−) delta — the
  *    failure mode view arithmetic uniquely has.
  *
  * Each stage is spec-proven alone (CdcStreamSpec, IvmSpec,
  * UpsertSinkSpec's marker discipline); this spec proves they compose.
  */
class IvmConnectorE2ESpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("file feed → compactState → maintainView store equals batch incremental view, with restart and replay") {
    import spark.implicits._
    // sf0.01: the smallest scale where some keys' newest change is a
    // delete, so tombstone (+/−) transitions exercise the view too
    val dir = "/root/testdata/sf0.01"

    val tmp = Files.createTempDirectory("ivm_e2e").toFile
    val feedDir = new java.io.File(tmp, "feed"); feedDir.mkdirs()
    val ckpt = new java.io.File(tmp, "ckpt").getAbsolutePath
    val store = new java.io.File(tmp, "store").getAbsolutePath

    val captured = scala.collection.mutable.ArrayBuffer.empty[(Long, Seq[Row], DataFrame)]
    def startQuery() = {
      val changes = spark.readStream
        .schema("event_id BIGINT, ts_ns BIGINT, user_id BIGINT, op STRING, event_type STRING, value DOUBLE")
        .parquet(feedDir.getAbsolutePath)
        .as[CdcStream.Change]
      CdcStream.compactState(spark, changes, tombstoneRetentionMs = Long.MaxValue / 4)
        .toDF()
        .writeStream.outputMode(org.apache.spark.sql.streaming.OutputMode.Update)
        .option("checkpointLocation", ckpt)
        .foreachBatch { (batch: DataFrame, id: Long) =>
          captured += ((id, batch.collect().toSeq, batch))
          IvmSink.applyBatch(spark, store)(batch, id)
        }
        .start()
    }

    // ---- drive: the ordered feed over two arrivals with a FULL
    // stream restart between them — the second half's compaction must
    // come from checkpointed state for keys spanning both halves
    val feed = CdcOps.changeFeed(spark, dir)
      .select($"event_id", $"ts_ns", $"user_id", $"op", $"event_type", $"value")
      .as[(Long, Long, Long, String, String, Double)].collect().sortBy(c => (c._2, c._1))
    val (h1, h2) = feed.splitAt(feed.length / 2)
    h1.toSeq.toDF("event_id", "ts_ns", "user_id", "op", "event_type", "value")
      .coalesce(1).write.mode("append").parquet(feedDir.getAbsolutePath)
    val q1 = startQuery(); q1.processAllAvailable(); q1.stop()
    h2.toSeq.toDF("event_id", "ts_ns", "user_id", "op", "event_type", "value")
      .coalesce(1).write.mode("append").parquet(feedDir.getAbsolutePath)
    val q2 = startQuery(); q2.processAllAvailable(); q2.stop()

    // ---- served view equals the batch incremental view (rounded at
    // the serving edge exactly as the registered query rounds)
    def servedView() = IvmSink.readView(spark, store).get
      .select($"last_type", $"n_entities", round($"sum_value", 2).as("sum_value"))
      .as[(String, Long, Double)].collect().toSet
    val streamed = servedView()
    val batchView = CdcOps.cdcIncrementalView(spark, dir)
      .as[(String, Long, Double)].collect().toSet
    assert(batchView.nonEmpty)
    assert(streamed === batchView,
      s"served view diverges: stream ${streamed -- batchView} vs batch ${batchView -- streamed}")

    // ---- maintained state equals the batch compaction (live keys)
    val streamedState = Ivm.serve(IvmSink.readState(spark, store).get)
      .select($"user_id", $"last_event_id", $"last_op", $"last_type")
      .as[(Long, Long, String, String)].collect().toSet
    val batchState = CdcOps.cdcEnvelope(spark, dir)
      .select($"user_id", $"last_event_id", $"last_op", $"last_type")
      .as[(Long, Long, String, String)].collect().toSet
    assert(streamedState === batchState, "maintained state diverges from batch compaction")

    // ---- replay: re-driving the last committed micro-batch must not
    // double-apply its (+/−) view delta
    val (lastId, rows, proto) = captured.filter(_._2.nonEmpty).last
    val replayDf = spark.createDataFrame(
      scala.jdk.CollectionConverters.SeqHasAsJava(rows).asJava, proto.schema)
    val committedBefore = IvmSink.committedBatches(spark, store)
    IvmSink.applyBatch(spark, store)(replayDf, lastId)
    assert(IvmSink.committedBatches(spark, store) === committedBefore,
      "replayed batch minted a new store version")
    assert(servedView() === streamed, "replayed batch changed the served view")
  }
}
