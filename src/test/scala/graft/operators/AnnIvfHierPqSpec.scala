package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The fully-composed layout's contracts beyond the hash gate (the
  * oracle's FLAT assignment already re-proves hier ≡ flat on real
  * data every run): trained codebooks must genuinely differ from the
  * seed composition (this is not q_ann_ivf_pq re-registered), the
  * structure is sane, and the trained+hierarchical+compressed search
  * keeps usable recall against the exact brute force.
  */
class AnnIvfHierPqSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf01 = "/root/testdata/sf0.01"

  test("the trained composition is not the seed composition") {
    val seed = AnnOps.annIvfPq(spark, sf01).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val trained = AnnOps.annIvfHierPq(spark, sf01).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(trained.nonEmpty)
    assert(seed !== trained,
      "trained anchors + trained codebooks must change the search (else the " +
        "composition silently fell back to the seed tables)")
  }

  test("structure: at most K rows per probe, dense ranks, scores in [-1, 1]") {
    val rows = AnnOps.annIvfHierPq(spark, sf01).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getLong(0)).foreach { case (p, rs) =>
      assert(rs.length <= 5, s"probe $p returned ${rs.length} rows")
      assert(rs.map(_.getLong(4)).sorted.toSeq === (1L to rs.length).toSeq,
        s"probe $p ranks not dense")
    }
    rows.foreach(r => assert(math.abs(r.getDouble(3)) <= 1.0 + 1e-9))
  }

  test("recall@5 against the exact brute force clears the IVF pruning floor") {
    val truth = AnnOps.annTopK(spark, sf01).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = AnnOps.annIvfHierPq(spark, sf01).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = truth.intersect(got).size.toDouble / truth.size
    // trained cells + trained codebooks should do no worse than the
    // seed composition's floor
    assert(recall >= 0.3, s"recall@5 $recall below floor")
  }
}
