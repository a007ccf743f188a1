package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The distilled quality classifier's contracts: the distributed
  * INTEGER micro-unit GD loop must equal an independent driver-side
  * integer replica (same micro features, same lookup-table sigmoid,
  * same round-half-up gradient division) weight for weight; the
  * trained scorer must actually beat the majority class (the
  * distillation learned the rule, not a constant); and the loop's
  * driver state is 4 longs per step. There is NO floating-point
  * quantity anywhere in the replica — the boundary-risk closure the
  * integer rewrite bought is what this spec pins.
  */
class QualityLrSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.01"

  private def r6(v: Double): Double =
    BigDecimal.valueOf(v).setScale(6, scala.math.BigDecimal.RoundingMode.HALF_UP).toDouble

  /** The integer sigmoid replica — the same table constants and the
    * same clamp/lookup/interpolate arithmetic as TextOps.lrPm.
    */
  private def pm(w: Array[Long], x1: Long, x2: Long, x3: Long): Long = {
    val tab = TextOps.SigTable
    val s = w(0) * 1000000L + w(1) * x1 + w(2) * x2 + w(3) * x3
    val z = Math.floorDiv(s, 1000000L)
    val zc = math.max(TextOps.SigLoMicro, math.min(TextOps.SigHiMicro, z))
    val off = zc - TextOps.SigLoMicro
    val idx = (off / TextOps.SigStep).toInt
    val frac = off % TextOps.SigStep
    tab(idx) + (tab(idx + 1) - tab(idx)) * frac / TextOps.SigStep
  }

  private def rhu(num: BigInt, den: BigInt): BigInt = {
    val a = num * 2 + den
    val b = den * 2
    (a - a.mod(b)) / b
  }

  test("distributed training equals the driver-side INTEGER replica, weight for weight") {
    val rows = features(sf).collect()
    var w = Array(0L, 0L, 0L, 0L)
    for (_ <- 1 to TextOps.LrSteps) {
      val g = Array.fill(4)(BigInt(0))
      rows.foreach { case (x1, x2, x3, y) =>
        val d = BigInt(pm(w, x1, x2, x3) - y.toLong * 1000000L)
        g(0) += d; g(1) += d * x1; g(2) += d * x2; g(3) += d * x3
      }
      val n = BigInt(rows.length)
      w = Array.tabulate(4) { j =>
        val den = if (j == 0) n else n * 1000000L
        w(j) - TextOps.LrRate * rhu(g(j), den).toLong
      }
    }
    val got = TextOps.qualityLr(spark, sf).collect()(0)
    assert(got.getLong(0) === rows.length.toLong)
    val gotW = Array(got.getDouble(1), got.getDouble(2), got.getDouble(3), got.getDouble(4))
    // the readout emits wm / 1e6 — an exact IEEE division of the
    // integer weights, so equality is EXACT, not approximate
    assert(gotW.toSeq === w.map(_ / 1e6).toSeq,
      s"distributed ${gotW.mkString(",")} vs replica ${w.mkString(",")}")
    // and the reported accuracy matches the replica's readout
    val acc = rows.count { case (x1, x2, x3, y) =>
      (pm(w, x1, x2, x3) >= 500000L) == (y == 1.0)
    }.toDouble / rows.length
    assert(got.getDouble(5) === r6(acc))
  }

  test("the integer sigmoid is a faithful sigmoid (monotone, symmetric, tight)") {
    val tab = TextOps.SigTable
    // monotone nondecreasing over the whole table, exact endpoints
    tab.sliding(2).foreach(p => assert(p(0) <= p(1)))
    assert(tab.head === 0L && tab.last === 1000000L)
    assert(tab(TextOps.SigHalf) === 500000L) // σ(0) = 0.5 exactly
    // interpolated values stay within 2 micro-units of the true
    // sigmoid across a dense z sweep (PL error bound step²·max|σ″|/8
    // ≈ 8e-7 plus table rounding)
    (-20000 to 20000 by 7).foreach { zMilli =>
      val zMicro = zMilli * 1000L
      val w = Array(zMicro, 0L, 0L, 0L)
      val got = pm(w, 0L, 0L, 0L)
      val want = 1e6 / (1.0 + math.exp(-zMicro / 1e6))
      assert(math.abs(got - want) <= 2.0,
        s"z=$zMicro: table $got vs true $want")
    }
  }

  test("the serve-side scores are consistent with the training readout") {
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
    val rows = features(sf).collect()
    val posShare = rows.count(_._4 == 1.0).toDouble / rows.length
    val majority = math.max(posShare, 1 - posShare)
    assert(posShare > 0.1 && posShare < 0.9, "labels degenerate — the task is vacuous")
    val acc = TextOps.qualityLr(spark, sf).collect()(0).getDouble(5)
    assert(acc > majority + 0.02,
      s"acc $acc does not beat majority $majority — nothing was learned")
  }

  /** The micro-unit feature frame as the replica consumes it. */
  private def features(dir: String): org.apache.spark.sql.Dataset[(Long, Long, Long, Double)] = {
    import spark.implicits._
    graft.operators.TextOps.lrFeaturesForSpec(spark, dir)
      .as[(Long, Long, Long, Double)]
  }
}
