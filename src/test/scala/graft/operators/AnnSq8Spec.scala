package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Quality guards for the SQ8-quantized ANN search: the quantized
  * score must stay within the scalar-quantization error envelope of
  * the exact cosine, and the two-stage search (int8 candidates →
  * exact re-rank) must recover nearly all of the exact top-k.
  */
class AnnSq8Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.01"

  test("returns full exact-re-ranked top-k per probe with qcos close to the exact cos") {
    val rows = AnnOps.annSq8(spark, sf).collect()
    val byProbe = rows.groupBy(_.getLong(0))
    assert(byProbe.size === 10)
    byProbe.values.foreach { g =>
      assert(g.map(_.getLong(4)).sorted.toSeq === Seq(1L, 2L, 3L, 4L, 5L))
      // ranks ordered by the EXACT cosine (column 3), not the proxy
      val ordered = g.sortBy(_.getLong(4)).map(_.getDouble(3))
      assert(ordered.zip(ordered.tail).forall { case (a, b) => a >= b })
    }
    // int8 symmetric quantization: per-component error ≤ qs/2 with
    // qs ≈ max|x|/127, so the cosine proxy lands within ~1% of exact
    // for 64-dim vectors; 0.05 is a generous envelope that still
    // catches any scale/ordering bug outright
    rows.foreach { r =>
      assert(math.abs(r.getDouble(2) - r.getDouble(3)) < 0.05,
        s"qcos ${r.getDouble(2)} vs cos ${r.getDouble(3)}")
    }
  }

  test("IVF×SQ8 composition recovers nearly all of the float IVF's results") {
    // same cells, same probed cohorts — int8 scoring inside the cells
    // should almost never change which candidates survive the re-rank
    val ivf = AnnOps.annIvf(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivfSq8 = AnnOps.annIvfSq8(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = ivfSq8.intersect(ivf).size.toDouble / ivf.size
    assert(recall >= 0.9, s"recall vs float IVF = $recall")
  }

  test("sq8 recall recovers nearly all of the exact top-k") {
    val exact = AnnOps.annTopK(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val sq8 = AnnOps.annSq8(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = sq8.intersect(exact).size.toDouble / exact.size
    // the 20-candidate int8 prefilter + exact re-rank should be a
    // near-exact search at this dimensionality
    assert(recall >= 0.9, s"recall@5 = $recall")
  }
}
