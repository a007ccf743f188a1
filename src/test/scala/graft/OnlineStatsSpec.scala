package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.OnlineStats
import graft.streaming.OnlineStats.{KeyStats, Obs}

/** Online-moments contracts: exact Welford values on a tiny known
  * series, and stream ≡ batch (n exact, moments to fp-merge-order
  * tolerance) on the real events feed split across micro-batches.
  */
class OnlineStatsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.Sf

  test("Welford update reproduces exact moments of a known series") {
    val s = Seq(2.0, 4.0, 4.0, 4.0, 5.0, 5.0, 7.0, 9.0)
      .foldLeft(KeyStats("k", 0L, 0.0, 0.0))(OnlineStats.update)
    assert(s.n === 8L)
    assert(s.mean === 5.0)
    assert(s.variancePop === 4.0) // classic textbook series: σ²_pop = 4
    assert(s.stddevPop === 2.0)
  }

  test("the monitor flags a planted spike against PRIOR history only, and stays quiet on steady keys") {
    import spark.implicits._
    import graft.streaming.OnlineStats.{Scored, TimedObs}
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // steady key: N(10, 1)-ish deterministic wiggle; spiked key: same
    // wiggle with one 10-sigma spike planted at seq 30
    def wiggle(i: Int): Double = 10.0 + (i % 5 - 2) * 0.5
    val steady = (0 until 40).map(i => TimedObs("steady", i, wiggle(i)))
    val spiked = (0 until 40).map { i =>
      TimedObs("spiked", i, if (i == 30) 60.0 else wiggle(i))
    }
    val obs = (steady ++ spiked).sortBy(_.seq)
    val input = MemoryStream[TimedObs]
    val q = OnlineStats.scoreStream(spark, input.toDS())
      .writeStream.format("memory").queryName("monitor")
      .outputMode(OutputMode.Append).start()
    obs.grouped(16).foreach { c => input.addData(c); q.processAllAvailable() }
    val scored = spark.table("monitor").as[Scored].collect()
    q.stop()

    val flagged = scored.filter(_.is_anomaly)
    assert(flagged.map(s => (s.key, s.seq)).toSet === Set(("spiked", 30L)),
      s"expected exactly the planted spike, got ${flagged.toSeq}")
    // causality: the spike's own value must NOT be in the history it
    // was scored against
    val spike = flagged.head
    assert(spike.n_seen === 30L)
    assert(spike.z > 10.0)
    // warm-up discipline: nothing scores before MinHistory
    assert(scored.filter(_.n_seen < 10).forall(_.z === 0.0))
  }

  test("stream equals batch per event_type on the real feed, across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val obs = graft.sources.Tables.events(spark, sf)
      .select(col("event_type").as("key"), col("value").cast("double").as("v"))
      .as[Obs].collect().toSeq
    val chunks = obs.grouped(math.max(obs.size / 4, 1)).toSeq

    val input = MemoryStream[Obs]
    val q = OnlineStats.perKey(spark, input.toDS())
      .writeStream.format("memory").queryName("onlinestats")
      .outputMode(OutputMode.Update).start()
    chunks.foreach { c => input.addData(c); q.processAllAvailable() }
    val last = spark.table("onlinestats").as[KeyStats].collect()
      .groupBy(_.key).map { case (k, v) => k -> v.maxBy(_.n) }
    q.stop()

    val batch = graft.sources.Tables.events(spark, sf)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), avg(col("value")).as("mean"),
        stddev_pop(col("value")).as("sd"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3)))
      .toMap
    assert(batch.nonEmpty && last.keySet === batch.keySet)
    batch.foreach { case (k, (n, mean, sd)) =>
      val s = last(k)
      assert(s.n === n, s"$k: n")
      assert(math.abs(s.mean - mean) <= 1e-9 * math.max(1.0, math.abs(mean)), s"$k: mean")
      assert(math.abs(s.stddevPop - sd) <= 1e-9 * math.max(1.0, sd), s"$k: sd")
    }
  }
}
