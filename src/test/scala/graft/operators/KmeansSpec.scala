package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.sources.Tables

/** Guards for the Lloyd-iterated spherical k-means anchors: the cost
  * monotonicity the update rule guarantees, anchor invariants, and the
  * IVF wiring through [[AnnOps.annIvfWith]].
  */
class KmeansSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf01 = "/root/testdata/sf0.01"

  private def emb = Tables.embeddings(spark, sf01).select(col("vec_id"), col("embedding"))

  test("spherical Lloyd cost is non-increasing every iteration and strictly improves on the first") {
    val trace = Kmeans.anchorsTrace(emb, k = 16, iters = 4)
    val costs = trace.map(a => Kmeans.cost(emb, a).head.getDouble(0))
    costs.sliding(2).foreach { case Seq(a, b) =>
      assert(b <= a + 1e-12, s"cost increased: $costs")
    }
    assert(costs(1) < costs(0) - 1e-9,
      s"first iteration should strictly improve the lowest-id init: $costs")
    assert(costs.forall(c => c >= -1e-12 && c <= 2.0 + 1e-12))
  }

  test("anchors keep k unit-norm cells with stable cell ids") {
    val a = Kmeans.anchors(emb, k = 16, iters = 3)
    val rows = a.select(col("cell"),
        sqrt(aggregate(col("c"), lit(0.0), (acc, x) => acc + x * x)).as("nrm"))
      .collect()
    assert(rows.length === 16)
    assert(rows.map(_.getLong(0)).sorted.toSeq === (0L until 16L))
    rows.foreach(r => assert(math.abs(r.getDouble(1) - 1.0) < 1e-9))
  }

  test("empty cells inherit the previous anchor instead of vanishing") {
    import spark.implicits._
    // 2 tight clusters and k = 3: one anchor ends up with no members
    // after the first assignment and must survive with its old vector
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f)), (1L, Array(0.99f, 0.01f)),
      (2L, Array(0.0f, 1.0f)), (3L, Array(0.01f, 0.99f)),
      (4L, Array(0.98f, 0.02f)), (5L, Array(0.02f, 0.98f)))
      .toDF("vec_id", "embedding")
    val trace = Kmeans.anchorsTrace(vecs, k = 3, iters = 3)
    trace.foreach(a => assert(a.count() === 3))
    val costs = trace.map(a => Kmeans.cost(vecs, a).head.getDouble(0))
    costs.sliding(2).foreach { case Seq(a, b) => assert(b <= a + 1e-12) }
  }

  test("annIvfWith(kmeans anchors) returns a well-formed per-probe top-k") {
    val anchors = Kmeans.anchors(emb, k = 16, iters = 2)
    val out = AnnOps.annIvfWith(spark, sf01, anchors)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    assert(out.nonEmpty)
    out.groupBy(_._1).foreach { case (_, rows) =>
      assert(rows.map(_._4).sorted.toSeq === (1L to rows.length))
      assert(rows.forall { case (p, v, cos, _) => p != v && cos >= -1.0 && cos <= 1.0 })
    }
  }
}
