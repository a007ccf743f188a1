package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Rate-anomaly contracts on controlled feeds: a constant-rate type
  * pins z = 0 (no division by zero, nothing flagged), a flash hour is
  * flagged with the exact z, and quiet hours around it are not.
  */
class RateAnomalySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def run(events: Seq[(Long, java.sql.Timestamp, Long, String, Double)]) = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("rateanom").toString
    events.toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    CdcOps.rateAnomaly(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getDouble(5), r.getBoolean(6))).toMap
  }

  private def ts(hour: Int, minute: Int) =
    java.sql.Timestamp.valueOf(f"2024-01-01 $hour%02d:$minute%02d:00")

  test("constant rate: sigma = 0 path pins z = 0 and flags nothing") {
    val ev = for (h <- 0 until 6; m <- Seq(0, 30)) yield
      ((h * 2 + m / 30).toLong, ts(h, m), 1L, "steady", 1.0)
    val rows = run(ev)
    assert(rows.size === 6)
    rows.values.foreach { case (n, z, flag) =>
      assert(n === 2L && z === 0.0 && !flag)
    }
  }

  test("a flash hour is flagged with the exact z; quiet hours are not") {
    // 11 hours at 2 events + 1 hour at 30: mu = 52/12, flash z > 3
    var id = 0L
    def next(): Long = { id += 1; id }
    val quiet = for (h <- 0 until 11; m <- Seq(0, 30)) yield
      (next(), ts(h, m), 1L, "bursty", 1.0)
    val flash = for (m <- 0 until 30) yield
      (next(), ts(11, m), 1L, "bursty", 1.0)
    val rows = run(quiet ++ flash)
    val counts = Seq.fill(11)(2.0) :+ 30.0
    val mu = counts.sum / counts.size
    val sigma = math.sqrt(counts.map(c => (c - mu) * (c - mu)).sum / counts.size)
    def zOf(n: Double) =
      BigDecimal((n - mu) / sigma).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val flashHourS = ts(11, 0).getTime / 1000
    val (nF, zF, flagF) = rows(("bursty", flashHourS))
    assert(nF === 30L && zF === zOf(30) && flagF)
    rows.filterNot(_._1._2 == flashHourS).values.foreach { case (n, z, flag) =>
      assert(n === 2L && z === zOf(2) && !flag)
    }
  }
}
