package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Pins the degenerate-group guards of the outlier operators on a
  * corpus that actually CONTAINS degenerate groups (the shipped
  * testdata has none, so the oracle gate alone cannot exercise them):
  *
  *  - a constant group (sd = 0, MAD = 0) emits NO rows — Spark's
  *    NULL-on-zero-division and DuckDB's ±inf would otherwise diverge
  *    silently, flagging phantom outliers on one engine only;
  *  - a majority-identical group has EXACT MAD = 0 but a small
  *    positive SKETCH MAD (the estimate interpolates inside the zero
  *    bin), so the keep path flags the minority values while the
  *    rz_exact audit goes NULL under its own mad_x > 0 guard — the
  *    divergence is pinned here as documented behavior;
  *  - a well-behaved group still flags its outlier, and the sketch
  *    keep-decision agrees with the exact audit column on it.
  */
class OutlierGuardSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def frame(rows: Seq[(String, Long, Double)]) = {
    import spark.implicits._
    rows.toDF("event_type", "event_id", "value")
  }

  /** 100 inliers tightly around 10.0 plus one far outlier. */
  private val spiked: Seq[(String, Long, Double)] =
    (1 to 100).map(i => ("spiked", i.toLong, 10.0 + (i % 7) * 0.1)) :+
      (("spiked", 999L, 500.0))

  private val constant: Seq[(String, Long, Double)] =
    (1 to 50).map(i => ("const", i.toLong, 42.0))

  /** 75 % identical: exact MAD = 0, sketch MAD small but positive. */
  private val majority: Seq[(String, Long, Double)] =
    (1 to 40).map(i => ("majority", i.toLong, if (i % 4 == 0) 6.0 else 5.0))

  test("z-score: constant group emits no rows, spiked group flags the spike") {
    val out = CoreOps.valueOutliersFrame(frame(spiked ++ constant)).collect()
    assert(out.forall(_.getString(0) == "spiked"))
    assert(out.map(_.getLong(1)).toSeq == Seq(999L))
  }

  test("robust: constant group emits no rows alongside a spiked one") {
    val out = CoreOps.valueOutliersRobustFrame(frame(spiked ++ constant)).collect()
    assert(out.forall(_.getString(0) == "spiked"))
    assert(out.map(_.getLong(1)).toSeq == Seq(999L))
  }

  test("robust: majority-identical group flags the minority, exact audit goes NULL") {
    val out = CoreOps.valueOutliersRobustAuditedFrame(frame(majority)).collect()
    assert(out.nonEmpty)
    // flagged rows are exactly the 6.0 minority; every audit is NULL
    // because mad_x = 0 is guarded, never divided through
    assert(out.forall(r => r.getDouble(2) == 6.0))
    assert(out.length === majority.count(_._3 == 6.0))
    assert(out.forall(_.isNullAt(4)))
  }

  test("robust: sketch decision carries a non-null exact audit that agrees") {
    val out = CoreOps.valueOutliersRobustAuditedFrame(frame(spiked)).collect()
    assert(out.length == 1)
    val r = out.head
    val rz = r.getDouble(3)
    val rzExact = r.getDouble(4)
    assert(!r.isNullAt(4))
    assert(math.abs(rz) >= 3.5)
    assert(math.abs(rzExact) >= 3.5, s"audit disagrees: rz=$rz rz_exact=$rzExact")
  }

  test("robust: all-identical corpus (every group degenerate) is empty, not an error") {
    assert(CoreOps.valueOutliersRobustFrame(frame(constant)).count() === 0)
    assert(CoreOps.valueOutliersFrame(frame(constant)).count() === 0)
  }
}
