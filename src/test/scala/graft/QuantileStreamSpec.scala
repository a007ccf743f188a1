package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.QuantileSketch
import graft.streaming.QuantileStream
import graft.streaming.QuantileStream.{Obs, QEst}

/** The streaming quantile sketch's contract is EXACT equality with
  * the batch sketch over the same prefix and the same base range —
  * the order-free histogram is what makes that possible, and these
  * pins are what prove the scalar mirrors (binOf, rank selection,
  * interpolation) never drift from the batch column expressions.
  */
class QuantileStreamSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val qs = Seq(0.5, 0.9, 0.99)

  private lazy val feed: Seq[Obs] = {
    import spark.implicits._
    graft.sources.Tables.events(spark, TestSpark.Sf)
      .select(col("event_type").as("key"), col("value").cast("double").as("v"))
      .as[Obs].collect().toSeq
  }

  private lazy val base: Map[String, (Double, Double)] = {
    import spark.implicits._
    QuantileSketch.keyRange(feed.toDF("key", "v"), "key", "v")
      .collect().map(r => r.getString(0) -> ((r.getDouble(1), r.getDouble(2)))).toMap
  }

  test("scalar binOf equals the batch bin expression over the real feed") {
    import spark.implicits._
    val df = feed.toDF("key", "v")
    val rangeDf = QuantileSketch.keyRange(df, "key", "v")
    val batchBins = QuantileSketch.histogram(df, "key", "v", rangeDf)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    val scalarBins = feed.groupBy(o => (o.key,
        QuantileStream.binOf(o.v, base(o.key)._1, base(o.key)._2).toLong))
      .map { case (k, os) => k -> os.size.toLong }
    assert(scalarBins === batchBins, "scalar binning must equal the batch bin expression")
  }

  test("stream equals batch estimates after EVERY micro-batch, exactly") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val chunks = feed.grouped(math.max(feed.size / 3, 1)).toSeq
    val baseDf = base.toSeq.map { case (k, (lo, hi)) => (k, lo, hi) }
      .toDF("key", "lo", "hi")

    val input = MemoryStream[Obs]
    val q = QuantileStream.perKey(spark, input.toDS(), base, qs)
      .writeStream.format("memory").queryName("qstream")
      .outputMode(OutputMode.Update).start()
    try {
      var prefix = Seq.empty[Obs]
      chunks.foreach { c =>
        prefix ++= c
        input.addData(c)
        q.processAllAvailable()
        val got = spark.table("qstream").as[QEst].collect()
          .groupBy(e => (e.key, e.q)).map { case (k, es) => k -> es.maxBy(_.n) }
        // batch twin over the same prefix against the same base range
        val pdf = prefix.toDF("key", "v")
        val range = pdf.groupBy("key").agg(count(lit(1)).as("n"))
          .join(baseDf, "key").select(col("key"), col("lo"), col("hi"), col("n"))
        val hist = QuantileSketch.histogram(pdf, "key", "v", baseDf)
        val want = QuantileSketch.estimates(hist, range, qs)
          .collect().map(r => (r.getString(0), r.getDouble(1)) -> r.getDouble(2)).toMap
        val seen = prefix.groupBy(_.key).map { case (k, v) => k -> v.size.toLong }
        assert(want.nonEmpty)
        want.foreach { case (k, est) =>
          assert(got(k).est === est,
            s"$k after ${prefix.size} rows: stream must equal the batch estimate EXACTLY")
          assert(got(k).n === seen(k._1))
        }
      }
    } finally q.stop()
  }

  test("estimates are sane percentiles: within the base range and monotone in q per key") {
    val cnts = feed.groupBy(_.key).map { case (k, os) =>
      val arr = new Array[Long](QuantileSketch.Bins)
      os.foreach(o => arr(QuantileStream.binOf(o.v, base(k)._1, base(k)._2)) += 1)
      k -> ((arr, os.size.toLong))
    }
    cnts.foreach { case (k, (arr, n)) =>
      val (lo, hi) = base(k)
      val ests = qs.map(q => QuantileStream.estimate(arr, n, lo, hi, q))
      ests.foreach(e => assert(e >= lo && e <= hi, s"$k: estimate $e outside [$lo, $hi]"))
      assert(ests === ests.sorted, s"$k: estimates must be monotone in q")
    }
  }
}
