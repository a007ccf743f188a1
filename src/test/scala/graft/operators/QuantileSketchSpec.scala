package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The quantile sketch must be (a) shard-mergeable by integer count
  * addition — the property that lets 1000 executors histogram 100 TB
  * without colocating values — and (b) accurate to its bin width
  * against the exact interpolated percentile.
  */
class QuantileSketchSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("histograms merge by count addition: sharded sketch equals whole sketch") {
    import spark.implicits._
    val e = graft.sources.Tables.events(spark, TestSpark.Sf)
      .select(col("event_type"), col("event_id"), col("value"))
    // one GLOBAL range (pass 1 runs once); shards bin against it
    val rng = QuantileSketch.keyRange(e, "event_type", "value").cache()
    def hist(df: org.apache.spark.sql.DataFrame) =
      QuantileSketch.histogram(df, "event_type", "value", rng)
    val whole = hist(e).as[(String, Long, Long)].collect()
      .map { case (k, b, c) => (k, b) -> c }.toMap
    val merged = QuantileSketch.merge(
        hist(e.filter(col("event_id") % 3 === 0)),
        hist(e.filter(col("event_id") % 3 =!= 0)))
      .as[(String, Long, Long)].collect()
      .map { case (k, b, c) => (k, b) -> c }.toMap
    assert(merged === whole)
  }

  test("estimate is within one bin width of the order statistic at the target rank") {
    // The sketch's provable contract: the selected bin contains rank
    // ⌈q·n⌉, and the estimate lies inside that bin, so both it and the
    // true order statistic at that rank sit within one bin width.
    // (The INTERPOLATED percentile can drift further when the rank
    // falls in a value gap — that is inherent to any histogram
    // summary, which is why the registered query carries p_exact as an
    // audit column rather than claiming value-equality.)
    val rows = CoreOps.quantilesSketch(spark, TestSpark.Sf).collect()
    assert(rows.length >= 15)
    val e = graft.sources.Tables.events(spark, TestSpark.Sf)
      .select(col("event_type"), col("value"))
    val sorted = e.collect()
      .map(r => r.getAs[String]("event_type") -> r.getAs[Double]("value"))
      .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).sorted }
    val widths = QuantileSketch.keyRange(e, "event_type", "value")
      .withColumn("w", (col("hi") - col("lo")) / QuantileSketch.Bins)
      .collect().map(r => r.getAs[String]("event_type") -> r.getAs[Double]("w")).toMap
    rows.foreach { r =>
      val k = r.getAs[String]("event_type")
      val q = r.getAs[Double]("q")
      val vs = sorted(k)
      val atRank = vs(math.ceil(q * vs.length).toInt - 1)
      val d = math.abs(r.getAs[Double]("p_sketch") - atRank)
      assert(d <= widths(k) + 1e-9,
        s"$k q=$q: |sketch-orderstat|=$d > one bin (${widths(k)})")
    }
  }

  test("estimates are monotone in q within each key") {
    CoreOps.quantilesSketch(spark, TestSpark.Sf).collect()
      .groupBy(_.getAs[String]("event_type"))
      .foreach { case (k, rs) =>
        val byQ = rs.sortBy(_.getAs[Double]("q")).map(_.getAs[Double]("p_sketch"))
        assert(byQ.sameElements(byQ.sorted), s"$k: estimates not monotone: ${byQ.toSeq}")
      }
  }

  test("binOf clamps out-of-range values and collapses degenerate ranges") {
    import spark.implicits._
    val df = Seq(-5.0, 0.0, 50.0, 100.0, 250.0).toDF("v")
    val bins = df.select(
        QuantileSketch.binOf(col("v"), lit(0.0), lit(100.0), 10).as("b"))
      .as[Long].collect()
    assert(bins.toSeq === Seq(0L, 0L, 5L, 9L, 9L)) // clamp below, in-range, clamp above
    val degen = df.select(QuantileSketch.binOf(col("v"), lit(7.0), lit(7.0), 10).as("b"))
      .as[Long].collect()
    assert(degen.forall(_ == 0L))
  }
}
