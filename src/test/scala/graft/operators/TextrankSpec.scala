package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** TextRank semantics on controlled graphs: the distributed iteration
  * must reproduce an exact driver-side replica of the damped weighted
  * PageRank recurrence, regular graphs must sit at the fixed point,
  * symmetric nodes must tie, and edgeless tokens must not appear.
  */
class TextrankSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val D = 0.85
  private val Iters = 5

  private def run(docs: Seq[(Long, String)]): Map[String, (Double, Long)] = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("textrank").toString
    docs.map { case (id, t) => (id, t, "en") }.toDF("doc_id", "text", "lang")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    TextOps.textrank(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getLong(2))).toMap
  }

  /** Driver-side replica of the exact recurrence the query iterates. */
  private def reference(adj: Seq[(String, String)]): Map[String, Double] = {
    val edges = (adj ++ adj.map(_.swap))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val nodes = edges.keys.map(_._1).toSet
    val wdeg = edges.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    var r = nodes.map(_ -> 1.0).toMap
    for (_ <- 1 to Iters) {
      r = nodes.map { v =>
        val in = edges.collect { case ((u, v2), w) if v2 == v =>
          (w.toDouble / wdeg(u)) * r(u)
        }
        v -> ((1 - D) + D * in.sum)
      }.toMap
    }
    r
  }

  test("a two-token doc sits at the fixed point: both ranks exactly 1") {
    val ranks = run(Seq((1L, "x y")))
    assert(ranks.keySet === Set("x", "y"))
    assert(ranks("x")._1 === 1.0 && ranks("y")._1 === 1.0)
    assert(ranks("x")._2 === 1L) // wdeg
  }

  test("path graph: center outranks the symmetric endpoints, which tie") {
    val ranks = run(Seq((1L, "x y z")))
    assert(ranks("y")._1 > ranks("x")._1)
    assert(ranks("x")._1 === ranks("z")._1)
    assert(ranks("y")._2 === 2L && ranks("x")._2 === 1L)
  }

  test("the distributed iteration equals the driver-side recurrence to the rounded digit") {
    // irregular weighted graph: repeats create weights > 1
    val docs = Seq(
      (1L, "a b c a b a d"),
      (2L, "c d c a b"),
      (3L, "e a e b"))
    val adj = docs.flatMap { case (_, t) =>
      val toks = t.split(" ")
      toks.zip(toks.tail).filter { case (u, v) => u != v }
    }
    val expect = reference(adj)
    val got = run(docs)
    assert(got.keySet === expect.keySet)
    got.foreach { case (t, (rank, _)) =>
      val e = BigDecimal(expect(t)).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(rank === e, s"token $t: got $rank expected $e")
    }
  }

  test("tokens with no neighbor of a different type never enter the graph") {
    val ranks = run(Seq((1L, "solo solo solo"), (2L, "x y")))
    assert(!ranks.contains("solo"))
    assert(ranks.keySet === Set("x", "y"))
  }
}
