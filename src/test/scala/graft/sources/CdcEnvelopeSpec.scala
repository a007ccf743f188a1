package graft.sources

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.operators.CdcOps
import graft.streaming.CdcStream

/** The JSON wire layer of the CDC pipeline: lossless roundtrip,
  * dead-letter routing for poison messages, and the full
  * source-connector path under Structured Streaming.
  */
class CdcEnvelopeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("serialize/parse roundtrip is lossless over the real change feed") {
    import spark.implicits._
    val feed = CdcOps.changeFeed(spark, TestSpark.Sf)
      .select($"event_id", $"ts_ns", $"user_id", $"op", $"event_type", $"value")
    val back = CdcEnvelope.records(CdcEnvelope.parse(CdcEnvelope.serialize(feed)))
      .select($"event_id", $"ts_ns", $"user_id", $"op", $"event_type", $"value")
    val a = feed.as[(Long, Long, Long, String, String, Double)].collect().toSet
    val b = back.as[(Long, Long, Long, String, String, Double)].collect().toSet
    assert(a === b)
    assert(a.nonEmpty)
    // both image sides are exercised: deletes carry before, c/u after
    assert(a.exists(_._4 == "d") && a.exists(_._4 != "d"))
  }

  test("poison messages land in the dead-letter queue, valid lines still parse") {
    import spark.implicits._
    val good = CdcEnvelope.serialize(
      Seq((1L, 10L, 7L, "c", "signup", 1.5), (2L, 20L, 7L, "d", "error", 0.0))
        .toDF("event_id", "ts_ns", "user_id", "op", "event_type", "value"))
    val wire = good.union(Seq("not json at all", "{\"op\":").toDF("value"))
    val parsed = CdcEnvelope.parse(wire)
    val recs = CdcEnvelope.records(parsed).collect()
    val dead = CdcEnvelope.deadLetters(parsed).collect().map(_.getString(0))
    assert(recs.length === 2)
    assert(dead.toSet === Set("not json at all", "{\"op\":"))
    // the delete's image came from the before side
    val d = CdcEnvelope.records(parsed).filter(col("op") === "d").collect().head
    assert(d.getAs[Long]("event_id") === 2L && d.getAs[String]("event_type") === "error")
  }

  test("serialize refuses a mistyped feed at plan time instead of dead-lettering it all") {
    import spark.implicits._
    // the exact regression shape round 8 shipped: ts_ns arriving as a
    // timestamp after a loader change — serialize must throw, because
    // downstream the typed parse would dead-letter EVERY record and
    // the envelope query would return an empty snapshot
    val mistyped = Seq((1L, java.sql.Timestamp.valueOf("2026-01-01 00:00:00"), 7L, "c", "signup", 1.5))
      .toDF("event_id", "ts_ns", "user_id", "op", "event_type", "value")
    val e = intercept[IllegalArgumentException](CdcEnvelope.serialize(mistyped))
    assert(e.getMessage.contains("ts_ns"))
  }

  test("systemic dead-letter rate fails the batch; isolated poison passes the guard") {
    import spark.implicits._
    val good = CdcEnvelope.serialize(
      (1 to 200).map(i => (i.toLong, i * 10L, i % 7L, "u", "click", 0.5))
        .toDF("event_id", "ts_ns", "user_id", "op", "event_type", "value"))
    // 1 poison line in 201 (~0.5%) is tolerable connector reality
    val fewBad = good.union(Seq("not json").toDF("value"))
    assert(CdcEnvelope.guardedRecords(CdcEnvelope.parse(fewBad)).count() === 200)
    // 50 in 250 (20%) is a systemic wire/schema mismatch — loud
    // failure AT EXECUTION (the guard is lazy: constructing the frame
    // or inspecting its plan runs nothing)
    val manyBad = good.union((1 to 50).map(i => s"garbage $i").toDF("value"))
    val guarded = CdcEnvelope.guardedRecords(CdcEnvelope.parse(manyBad))
    guarded.queryExecution.optimizedPlan // plan inspection: no job, no throw
    val e = intercept[Exception](guarded.count())
    assert(e.getMessage.contains("dead-lettered"),
      s"expected the guard message, got: ${e.getMessage}")
  }

  test("one-pass guardedRun: clean wire returns, poisoned wire throws after the staged action") {
    import spark.implicits._
    val good = CdcEnvelope.serialize(
      (1 to 200).map(i => (i.toLong, i * 10L, i % 7L, "u", "click", 0.5))
        .toDF("event_id", "ts_ns", "user_id", "op", "event_type", "value"))
    // isolated poison: action runs, result returned, no throw
    val fewBad = good.union(Seq("not json").toDF("value"))
    assert(CdcEnvelope.guardedRun(fewBad)(_.count()) === 200L)
    // systemic poison: the staged action still runs (one pass — the
    // rate is only known after it), but guardedRun then throws so the
    // caller never publishes the staged output
    val manyBad = good.union((1 to 50).map(i => s"garbage $i").toDF("value"))
    var staged = -1L
    val e = intercept[IllegalStateException](
      CdcEnvelope.guardedRun(manyBad) { df => staged = df.count(); staged })
    assert(e.getMessage.contains("dead-lettered"))
    assert(e.getMessage.contains("publish"))
    assert(staged === 200L, "the audit runs AFTER the staged action, one pass total")
  }

  test("batch listener guard flags a poisoned observed parse, stays quiet on a clean one") {
    import spark.implicits._
    val guard = CdcEnvelope.BatchDeadLetterGuard.install(spark)
    guard.reset()
    val good = CdcEnvelope.serialize(
      (1 to 200).map(i => (i.toLong, i * 10L, i % 7L, "u", "click", 0.5))
        .toDF("event_id", "ts_ns", "user_id", "op", "event_type", "value"))
    // listener delivery is async: wait on the guard's own audit
    // counter (positive signal) rather than a sleep
    def drain(past: Long): Unit = {
      val deadline = System.nanoTime() + 10L * 1000 * 1000 * 1000
      while (guard.observedCount <= past && System.nanoTime() < deadline)
        Thread.sleep(20)
      assert(guard.observedCount > past, "guard never audited the action's metrics")
    }
    val c0 = guard.observedCount
    CdcEnvelope.records(CdcEnvelope.observedParse(good)).count()
    drain(c0)
    assert(!guard.tripped, s"guard tripped on a clean wire: ${guard.violations}")
    val manyBad = good.union((1 to 50).map(i => s"garbage $i").toDF("value"))
    val c1 = guard.observedCount
    CdcEnvelope.records(CdcEnvelope.observedParse(manyBad)).count()
    drain(c1)
    assert(guard.tripped, "guard missed a 20% dead-letter batch")
    assert(guard.violations.exists(_.contains("50 of 250")), guard.violations.mkString("; "))
    // install is idempotent: a second install returns the SAME guard,
    // no duplicate listener that would double-report
    assert(CdcEnvelope.BatchDeadLetterGuard.install(spark) eq guard)
    guard.reset()
    assert(!guard.tripped)
  }

  test("q_cdc_envelope is one wire pass: single from_json, no cache, guard metric in-plan") {
    val plan = CdcOps.cdcEnvelope(spark, TestSpark.Sf).queryExecution.optimizedPlan
    val s = plan.toString
    val fromJsonCount = "from_json".r.findAllIn(s.toLowerCase).length
    assert(fromJsonCount === 1, s"expected exactly one wire parse in the plan, got $fromJsonCount")
    assert(!s.contains("InMemoryRelation"), "envelope query must not persist the wire")
    assert(plan.collect { case c: org.apache.spark.sql.catalyst.plans.logical.CollectMetrics => c }
      .exists(_.name == CdcEnvelope.GuardMetric),
      "observed-metrics guard node missing from the plan")
  }

  test("streaming dead-letter guard stops a poisoned stream, leaves a healthy one running") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    def goodLines(n: Int): Seq[String] = CdcEnvelope.serialize(
      (1 to n).map(i => (i.toLong, i * 10L, i % 7L, "u", "click", 0.5))
        .toDF("event_id", "ts_ns", "user_id", "op", "event_type", "value"))
      .as[String].collect().toSeq

    def drive(lines: Seq[String], name: String, guard: CdcEnvelope.DeadLetterGuard)(
        done: org.apache.spark.sql.streaming.StreamingQuery => Boolean) = {
      spark.streams.addListener(guard)
      val input = MemoryStream[String]
      val q = CdcEnvelope.records(CdcEnvelope.observedParse(input.toDF().select($"value")))
        .writeStream.format("memory").queryName(name).start()
      try {
        input.addData(lines)
        q.processAllAvailable()
        // listener events are async; wait (bounded) for the expected
        // terminal state instead of sampling a race
        val deadline = System.nanoTime() + 10L * 1000 * 1000 * 1000
        while (!done(q) && System.nanoTime() < deadline) Thread.sleep(50)
        (guard.tripped, q.isActive)
      } finally {
        if (q.isActive) q.stop()
        spark.streams.removeListener(guard)
      }
    }

    // 40% poison: systemic — the guard must trip and stop the query
    val poisoned = scala.util.Random.shuffle(
      goodLines(60) ++ (1 to 40).map(i => s"junk line $i"))
    val g1 = new CdcEnvelope.DeadLetterGuard(spark)
    val (tripped1, active1) = drive(poisoned, "guard_poisoned", g1)(q => g1.tripped && !q.isActive)
    assert(tripped1, "guard did not trip on 40% dead letters")
    assert(!active1, "guard tripped but the query kept running")
    assert(g1.trippedReason.exists(_.contains("dead-lettered")))

    // clean stream: the guard must stay quiet
    // the clean stream never reaches a "tripped" state — wait only for
    // one progress round to have been seen by the listener
    val g2 = new CdcEnvelope.DeadLetterGuard(spark)
    val seenProgress = new java.util.concurrent.atomic.AtomicBoolean(false)
    val witness = new org.apache.spark.sql.streaming.StreamingQueryListener {
      override def onQueryStarted(e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryTerminated(e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryTerminatedEvent): Unit = ()
      override def onQueryProgress(e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryProgressEvent): Unit =
        if (e.progress.name == "guard_clean" &&
            e.progress.observedMetrics.get(CdcEnvelope.GuardMetric) != null)
          seenProgress.set(true)
    }
    spark.streams.addListener(witness)
    val (tripped2, active2) =
      try drive(goodLines(100), "guard_clean", g2)(_ => seenProgress.get)
      finally spark.streams.removeListener(witness)
    assert(!tripped2, s"guard tripped on a clean stream: ${g2.trippedReason}")
    assert(active2, "clean query should still be active")
  }

  test("late-onset poisoning trips within the poisoned batch, not after lifetime dilution") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def goodLines(n: Int, from: Int = 1): Seq[String] = CdcEnvelope.serialize(
      (from until from + n).map(i => (i.toLong, i * 10L, i % 7L, "u", "click", 0.5))
        .toDF("event_id", "ts_ns", "user_id", "op", "event_type", "value"))
      .as[String].collect().toSeq
    val guard = new CdcEnvelope.DeadLetterGuard(spark)
    spark.streams.addListener(guard)
    val input = MemoryStream[String]
    val q = CdcEnvelope.records(CdcEnvelope.observedParse(input.toDF().select($"value")))
      .writeStream.format("memory").queryName("guard_late_onset").start()
    try {
      // a long clean history: 20k records, zero dead letters
      input.addData(goodLines(20000))
      q.processAllAvailable()
      assert(!guard.tripped, "guard tripped on the clean history")
      // then the upstream schema breaks: 20% of the next batch dead-
      // letters. Cumulative rate is 20/20100 ≈ 0.1% — far under the
      // 1% ceiling — so only the per-batch check can catch it now
      input.addData(goodLines(80, from = 20001) ++ (1 to 20).map(i => s"junk $i"))
      q.processAllAvailable()
      val deadline = System.nanoTime() + 10L * 1000 * 1000 * 1000
      while (!(guard.tripped && !q.isActive) && System.nanoTime() < deadline)
        Thread.sleep(50)
      assert(guard.tripped, "late-onset systemic failure not caught by per-batch rate")
      assert(!q.isActive, "guard tripped but the poisoned stream kept draining")
      assert(guard.trippedReason.exists(_.contains("this batch")), guard.trippedReason)
    } finally {
      if (q.isActive) q.stop()
      spark.streams.removeListener(guard)
    }
  }

  test("streaming wire -> parse -> tombstone compaction equals the batch envelope query") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    // sf0.01: the smallest scale where some keys' newest change is a
    // delete, so tombstones flow through the wire path too
    val dir = "/root/testdata/sf0.01"
    val lines = CdcEnvelope.serialize(CdcOps.changeFeed(spark, dir).select(
        $"event_id", $"ts_ns", $"user_id", $"op", $"event_type", $"value"))
      .as[String].collect()

    val input = MemoryStream[String]
    val changes = CdcEnvelope.records(CdcEnvelope.parse(input.toDF()))
      .select($"event_id", $"ts_ns", $"user_id", $"op", $"event_type", $"value")
      .as[CdcStream.Change]
    val q = CdcStream.compactState(spark, changes, tombstoneRetentionMs = Long.MaxValue / 4)
      .writeStream.format("memory").queryName("env_compact")
      .outputMode(OutputMode.Update).start()
    val (b1, b2) = lines.splitAt(lines.length / 2)
    Seq(b1, b2).foreach { b => input.addData(b.toSeq); q.processAllAvailable() }
    q.stop()

    val lastPerKey = spark.table("env_compact").as[CdcStream.Compacted].collect()
      .groupBy(_.user_id).map { case (_, es) => es.maxBy(_.n_changes) }
    val live = lastPerKey.filterNot(_.deleted)
      .map(s => s.user_id -> ((s.last_event_id, s.last_op, s.last_type))).toMap
    val batch = CdcOps.cdcEnvelope(spark, dir)
      .select($"user_id", $"last_event_id", $"last_op", $"last_type")
      .as[(Long, Long, String, String)].collect()
    assert(live.size === batch.length)
    batch.foreach { case (u, id, op, tpe) =>
      assert(live(u) === ((id, op, tpe)), s"user $u diverges through the wire")
    }
  }
}
