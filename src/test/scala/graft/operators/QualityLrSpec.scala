package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The distilled quality classifier's contracts: the distributed
  * full-batch GD loop must equal an independent driver-side replica
  * (same feature rounding, same per-row sigmoid rounding, same
  * gradient/weight rounding) weight for weight; the trained scorer
  * must actually beat the majority class (the distillation learned
  * the rule, not a constant); and the loop's driver state is 4
  * numbers per step.
  */
class QualityLrSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.01"

  private def r6(v: Double): Double =
    BigDecimal.valueOf(v).setScale(6, scala.math.BigDecimal.RoundingMode.HALF_UP).toDouble

  test("distributed training equals the driver-side replica, weight for weight") {
    import org.apache.spark.sql.functions._
    // collect the (rounded) feature frame once — the replica's input
    // is bit-identical to what the distributed loop reads
    val rows = Tables(sf).collect()
    var w = Array(0.0, 0.0, 0.0, 0.0)
    for (_ <- 1 to TextOps.LrSteps) {
      val g = Array(0.0, 0.0, 0.0, 0.0)
      rows.foreach { case (x1, x2, x3, y) =>
        val z = w(0) + w(1) * x1 + w(2) * x2 + w(3) * x3
        val p = r6(1.0 / (1.0 + math.exp(-z)))
        val d = p - y
        g(0) += d; g(1) += d * x1; g(2) += d * x2; g(3) += d * x3
      }
      w = Array.tabulate(4)(j => r6(w(j) - TextOps.LrRate * r6(g(j) / rows.length)))
    }
    val got = TextOps.qualityLr(spark, sf).collect()(0)
    assert(got.getLong(0) === rows.length.toLong)
    val gotW = Array(got.getDouble(1), got.getDouble(2), got.getDouble(3), got.getDouble(4))
    // the distributed sums may differ from the sequential replica in
    // the last ulp BEFORE rounding; after the 6-decimal gradient
    // rounding the weights must agree exactly
    assert(gotW.toSeq === w.toSeq,
      s"distributed ${gotW.mkString(",")} vs replica ${w.mkString(",")}")
    // and the reported accuracy matches the replica's readout
    val acc = rows.count { case (x1, x2, x3, y) =>
      val p = r6(1.0 / (1.0 + math.exp(-(w(0) + w(1) * x1 + w(2) * x2 + w(3) * x3))))
      (p >= 0.5) == (y == 1.0)
    }.toDouble / rows.length
    assert(got.getDouble(5) === r6(acc))
  }

  test("the serve-side scores are consistent with the training readout") {
    import org.apache.spark.sql.functions._
    val scores = TextOps.qualityLrScore(spark, sf).collect()
    val summary = TextOps.qualityLr(spark, sf).collect()(0)
    assert(scores.length.toLong === summary.getLong(0))
    // the decision column IS p >= 0.5, and the per-doc agreement rate
    // reproduces the reported training accuracy exactly
    scores.foreach(r => assert(r.getBoolean(2) === (r.getDouble(1) >= 0.5)))
    val agree = scores.count(r => r.getBoolean(2) === r.getBoolean(3))
    assert(r6(agree.toDouble / scores.length) === summary.getDouble(5))
    // scores are probabilities
    scores.foreach(r => assert(r.getDouble(1) >= 0.0 && r.getDouble(1) <= 1.0))
  }

  test("the distilled scorer beats the majority class — it learned the rule") {
    import org.apache.spark.sql.functions._
    val rows = Tables(sf).collect()
    val posShare = rows.count(_._4 == 1.0).toDouble / rows.length
    val majority = math.max(posShare, 1 - posShare)
    assert(posShare > 0.1 && posShare < 0.9, "labels degenerate — the task is vacuous")
    val acc = TextOps.qualityLr(spark, sf).collect()(0).getDouble(5)
    assert(acc > majority + 0.02,
      s"acc $acc does not beat majority $majority — nothing was learned")
  }

  /** The rounded feature frame as the replica consumes it. */
  private def Tables(dir: String): org.apache.spark.sql.Dataset[(Double, Double, Double, Double)] = {
    import spark.implicits._
    graft.operators.TextOps.lrFeaturesForSpec(spark, dir)
      .as[(Double, Double, Double, Double)]
  }
}
