package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Bit-equality contract of the two-level (anchor-of-anchors)
  * assignment vs the flat broadcast layouts it replaces at scale —
  * exact mode (route = groups): every leaf reachable, the broadcast
  * ceiling removed, identical rounded scores and ties.
  */
class HierAssignSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.01"

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[Seq[Any]] =
    df.collect().map(_.toSeq).toSeq.sortBy(_.mkString("|"))

  test("two-level float assignment reproduces the flat IVF pipeline bit for bit") {
    assert(rows(AnnOps.annIvfHier(spark, sf)) === rows(AnnOps.annIvf(spark, sf)))
  }

  test("two-level semdedup reproduces flat semdedup bit for bit") {
    assert(rows(DedupOps.semDedupHier(spark, sf)) === rows(DedupOps.semDedup(spark, sf)))
  }

  test("two-level unit-anchor assignment reproduces flat annIvfWith over the trained layout") {
    val anchors = AnnOps.trainedAnchors(spark, sf)
    val flat = AnnOps.annIvfWith(spark, sf, anchors, roundCcos = true)
    val hier = AnnOps.annIvfWith(spark, sf, anchors, roundCcos = true, hierarchical = true)
    assert(rows(hier) === rows(flat))
  }

  test("the trained anchor table is memoized per (session, dir, params)") {
    // one Lloyd training job per session — the second call must return
    // the SAME frame (reference equality), not re-train
    assert(AnnOps.trainedAnchors(spark, sf) eq AnnOps.trainedAnchors(spark, sf))
  }
}
