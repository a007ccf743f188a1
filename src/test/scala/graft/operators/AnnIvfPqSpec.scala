package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** IVF×PQ composition contracts: the ADC arithmetic must be identical
  * to standalone PQ (cell routing prunes candidates, never changes a
  * score), results are structurally sane, and the pruned search keeps
  * usable recall against the exact brute-force truth.
  */
class AnnIvfPqSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf01 = "/root/testdata/sf0.01"

  private def keyed(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getLong(1)) ->
      (r.getDouble(2), r.getDouble(3))).toMap

  test("qcos of any pair returned by both PQ and IVF-PQ is identical (shared ADC)") {
    val pq = keyed(AnnOps.annPq(spark, sf01))
    val ivfPq = keyed(AnnOps.annIvfPq(spark, sf01))
    val shared = pq.keySet.intersect(ivfPq.keySet)
    assert(shared.nonEmpty, "expected overlapping results at sf0.01")
    shared.foreach { k =>
      assert(pq(k)._1 === ivfPq(k)._1, s"pair $k: ADC scores diverge")
      assert(pq(k)._2 === ivfPq(k)._2, s"pair $k: exact cosines diverge")
    }
  }

  test("structure: at most K rows per probe, dense ranks, scores in [-1, 1]") {
    val rows = AnnOps.annIvfPq(spark, sf01).collect()
    assert(rows.nonEmpty)
    val byProbe = rows.groupBy(_.getLong(0))
    byProbe.foreach { case (p, rs) =>
      assert(rs.length <= 5, s"probe $p returned ${rs.length} rows")
      assert(rs.map(_.getLong(4)).sorted.toSeq === (1L to rs.length).toSeq,
        s"probe $p ranks not dense")
    }
    rows.foreach { r =>
      assert(math.abs(r.getDouble(3)) <= 1.0 + 1e-9)
    }
  }

  test("recall@5 against the exact brute force clears the IVF pruning floor") {
    val truth = AnnOps.annTopK(spark, sf01).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = AnnOps.annIvfPq(spark, sf01).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = truth.intersect(got).size.toDouble / truth.size
    // nprobe/cells = 4/16 of the corpus searched through 32-bit codes:
    // the composition must still find a usable share of the true top-5
    assert(recall >= 0.3, s"recall@5 $recall below floor")
  }
}
