package graft.operators

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Kneser–Ney's defining property — backoff mass follows context
  * DIVERSITY, not raw frequency — pinned with surface-identical
  * plants, plus a term-for-term driver replica and corpus sanity.
  */
class LmKneserSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def docs(rows: Seq[(Long, String)]): DataFrame = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  private def run(d: DataFrame): Map[Long, (Long, Double)] =
    TextOps.lmKneserFrom(d).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap

  /** X and Y are built surface-identical under MLE: the pinned
    * bigrams (q X) and (q Y) share count 1 and context q; X and Y
    * share total unigram frequency 3. Only context diversity differs
    * — X follows {q, r}, Y follows {q, s, t} — so MLE p = ct/c1
    * scores the twins EQUAL while Kneser–Ney's continuation backoff
    * must rank (q Y) more natural (the "Francisco" effect inverted:
    * the one-context word is the one that looks glued-on).
    */
  test("context diversity separates surface-identical twins; MLE cannot") {
    val corpus = Seq(
      (1L, "q X"), (2L, "q Y"),          // the pinned pair
      (3L, "r X"), (4L, "r X"),          // X's other context: just r
      (5L, "s Y"), (6L, "t Y"))          // Y's: s and t
    val got = run(docs(corpus))
    // model by hand: types {qX, qY, rX, sY, tY} → nt = 5
    // λ(q) = D·N1+(q·)/c(q) = 0.75·2/2; p_cont(X) = 2/5, p_cont(Y) = 3/5
    val pQX = (1 - 0.75) / 2 + 0.75 * 2 / 2.0 * 2 / 5.0
    val pQY = (1 - 0.75) / 2 + 0.75 * 2 / 2.0 * 3 / 5.0
    assert(math.abs(got(1L)._2 - round6(-math.log(pQX))) < 1e-9, "doc1 = -ln p(q X)")
    assert(math.abs(got(2L)._2 - round6(-math.log(pQY))) < 1e-9, "doc2 = -ln p(q Y)")
    assert(got(2L)._2 < got(1L)._2,
      "the diverse-context continuation must score more natural")
    // MLE on the same plants is blind: c(qX)/c(q) == c(qY)/c(q), so a
    // pure-MLE scorer assigns the twins identical xent — the
    // separation above is owed entirely to the continuation backoff
    assert(pQX != pQY)
  }

  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("the model equals a driver replica term for term on a planted corpus") {
    val corpus = Seq(
      (1L, "a b c a b"), (2L, "b c d"), (3L, "a b c c"), (4L, "d a"))
    val got = run(docs(corpus))
    val bis = corpus.flatMap { case (id, t) =>
      t.split(" ").sliding(2).filter(_.length == 2).map(w => (id, (w(0), w(1))))
    }
    val ct = bis.groupBy(_._2).map { case (k, v) => k -> v.size }
    val c1 = bis.groupBy(_._2._1).map { case (k, v) => k -> v.size }
    val n1f = ct.keys.groupBy(_._1).map { case (k, v) => k -> v.size }
    val n1b = ct.keys.groupBy(_._2).map { case (k, v) => k -> v.size }
    val nt = ct.size.toDouble
    val expect = bis.groupBy(_._1).map { case (id, g) =>
      val xs = g.map { case (_, w) =>
        -math.log((ct(w) - 0.75) / c1(w._1) + 0.75 * n1f(w._1) / c1(w._1) * n1b(w._2) / nt)
      }
      id -> (g.size.toLong, round6(xs.sum / xs.size))
    }
    expect.foreach { case (id, (n, x)) =>
      assert(got(id)._1 === n, s"doc$id n_bigrams")
      assert(math.abs(got(id)._2 - x) < 1e-9, s"doc$id xent_kn")
    }
  }

  test("corpus run is sane: every scored doc finite and non-negative, counts = len-1") {
    val rows = TextOps.lmKneser(spark, TestSpark.Sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, x) = (r.getLong(1), r.getDouble(2))
      assert(n >= 1L)
      assert(!x.isNaN && !x.isInfinite && x >= 0.0,
        s"doc ${r.getLong(0)}: xent_kn $x must be a finite non-negative cross-entropy")
    }
  }
}
