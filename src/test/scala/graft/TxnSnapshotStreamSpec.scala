package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.CdcOps
import graft.streaming.{CdcStream, TxnSnapshotStream, UpsertSink}

/** The streaming twin of the transactionally-consistent two-table
  * snapshot: after EVERY micro-batch commit the store must equal the
  * batch operator on exactly that feed prefix (every batch boundary
  * is a consistent cut — the claim the one-operator + one-marker
  * design makes structural), across a planted straddle split over a
  * batch boundary, orphaning, and line churn; replayed batch ids must
  * be no-ops (crash recovery); and the real-feed converged store must
  * equal the batch audit end to end.
  */
class TxnSnapshotStreamSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def tmpDir(): String =
    java.nio.file.Files.createTempDirectory("txnstore").toString

  // realistic epoch-ns event times — the watermark machinery treats
  // near-zero event times as already-late rows and drops them (the
  // UpsertSinkSpec discipline)
  private val T0 = 1700000000L * 1000000000L
  private def tMin(mins: Long) = T0 + mins * 60L * 1000000000L

  /** Run chunks through the stateful operator into a store; call
    * `probe` after each chunk's commit with the chunk index.
    */
  private def runStream(chunks: Seq[Seq[CdcStream.Change]], store: String)(
      probe: Int => Unit): Unit = {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[CdcStream.Change]
    val q = TxnSnapshotStream.txnState(spark, input.toDS())
      .writeStream
      .foreachBatch(TxnSnapshotStream.applyBatch(spark, store) _)
      .outputMode("update").start()
    chunks.zipWithIndex.foreach { case (c, i) =>
      input.addData(c); q.processAllAvailable(); probe(i)
    }
    q.stop()
  }

  private def snap(store: String): Set[Seq[Any]] =
    TxnSnapshotStream.readSnapshot(spark, store)
      .map(_.collect().map(_.toSeq).toSet).getOrElse(Set.empty)

  private def batchOn(rows: Seq[CdcStream.Change]): Set[Seq[Any]] = {
    import spark.implicits._
    CdcOps.txnSnapshotUncut(rows.toDF())
      .collect().map(_.toSeq).toSet
  }

  test("every micro-batch commit is a consistent cut: store ≡ batch on each prefix (real feed)") {
    import spark.implicits._
    val feed = CdcOps.changeFeed(spark, TestSpark.Sf)
      .select("event_id", "ts_ns", "user_id", "op", "event_type", "value")
      .as[CdcStream.Change].collect().sortBy(c => (c.ts_ns, c.event_id)).toSeq
    val chunks = feed.grouped(math.max(feed.size / 3, 1)).toSeq
    val store = tmpDir()
    runStream(chunks, store) { i =>
      val prefix = chunks.take(i + 1).flatten
      assert(snap(store) === batchOn(prefix),
        s"store after micro-batch $i must equal the batch snapshot of its prefix")
    }
  }

  test("the planted straddle arrives ACROSS a micro-batch boundary and never fractures") {
    val store = tmpDir()
    val c1 = Seq(
      CdcStream.Change(1L, tMin(0), 9L, "c", "signup", 1.0),
      CdcStream.Change(3L, tMin(1), 1L, "u", "view", 5.0)) // parent-visible update
    val c2 = Seq(
      CdcStream.Change(4L, tMin(9), 1L, "c", "click", 7.0)) // the child line lands LATER
    val c3 = Seq(
      CdcStream.Change(5L, tMin(10), 1L, "d", "view", 0.0)) // parent head tombstones
    var step = 0
    runStream(Seq(c1, c2, c3), store) { i =>
      step = i
      val s = snap(store)
      i match {
        case 0 =>
          // cut 1: u1's view line under a live parent; NO click line yet
          assert(s.exists(r => r(0) == 1L && r(1) == "view" && r(7) == "ok"))
          assert(!s.exists(r => r(0) == 1L && r(1) == "click"),
            "a child change past this batch's cut must be invisible")
        case 1 =>
          // cut 2: both lines present, parent = the click (newest)
          assert(s.exists(r => r(0) == 1L && r(1) == "click" && r(7) == "ok"))
          assert(s.exists(r => r(0) == 1L && r(1) == "view" && r(7) == "ok"))
        case 2 =>
          // cut 3: parent head is now a tombstone — surviving lines
          // flip to orphaned/un-served, exactly the batch audit
          val u1 = s.filter(_(0) == 1L)
          assert(u1.nonEmpty && u1.forall(r => r(7) == "orphaned" && r(8) == false))
      }
      // EVERY cut equals the batch operator on the prefix
      assert(s === batchOn(Seq(c1, c2, c3).take(i + 1).flatten))
    }
    assert(step === 2)
  }

  test("a replayed batchId is a no-op (crash-recovery idempotence)") {
    import spark.implicits._
    val store = tmpDir()
    val rows = Seq(
      TxnSnapshotStream.TxnOut(1L, "view", deleted = false, Some("view"), Some(3L),
        Some(5.0), Some(3L), Some("view"), Some(5.0), "ok", served = true)).toDF()
    TxnSnapshotStream.applyBatch(spark, store)(rows.as[TxnSnapshotStream.TxnOut], 0L)
    val v1 = snap(store)
    // the replay: same batchId, different (corrupt) payload — skipped
    val corrupt = Seq(
      TxnSnapshotStream.TxnOut(1L, "view", deleted = false, Some("view"), Some(99L),
        Some(9.9), None, None, None, "orphaned", served = false)).toDF()
    TxnSnapshotStream.applyBatch(spark, store)(corrupt.as[TxnSnapshotStream.TxnOut], 0L)
    assert(snap(store) === v1, "a committed batchId must not re-apply")
    assert(UpsertSink.committedBatches(spark, store) === Seq(0L))
  }

  test("line churn: a re-tombstoned child line leaves the store (tombstone diff emission)") {
    val store = tmpDir()
    val c1 = Seq(
      CdcStream.Change(1L, tMin(0), 2L, "u", "view", 1.0),
      CdcStream.Change(2L, tMin(1), 2L, "u", "click", 2.0))
    val c2 = Seq(CdcStream.Change(3L, tMin(2), 2L, "d", "click", 0.0))
    runStream(Seq(c1, c2), store) { i =>
      val s = snap(store)
      if (i == 0) assert(s.count(_(0) == 2L) === 2)
      else {
        // the click line died; the view line survives under the live
        // parent head? no — the newest PARENT change is the delete,
        // so the view line is orphaned (the batch rule)
        val u2 = s.filter(_(0) == 2L)
        assert(!u2.exists(_(1) == "click"), "the tombstoned line must leave the store")
        assert(u2.forall(r => r(1) == "view" && r(7) == "orphaned"))
        assert(s === batchOn(c1 ++ c2))
      }
    }
  }
}
