package graft.operators

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The interpolated trigram LM's contracts: a planted SHUFFLED-token
  * doc must score worse than its natural twin (same unigram multiset —
  * the sequence signal is the whole point) and be the one the z-flag
  * fires on; the Jelinek–Mercer mixture must equal an independent
  * driver replica term for term; and the corpus run is sane (every p
  * a legal probability, n_trigrams = len−2, flag non-degenerate).
  */
class LmTrigramSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def docs(rows: Seq[(Long, String)]): DataFrame = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  private def run(d: DataFrame): Map[Long, (Long, Double, Double, Boolean)] =
    TextOps.lmTrigramFrom(d).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getBoolean(4)))).toMap

  test("a shuffled-token doc scores worse than its natural twin and draws the flag") {
    val nat = "the quick brown fox jumps over the lazy dog"
    // same 9-token multiset, order destroyed (fixed permutation)
    val shuf = "fox the over quick lazy brown dog jumps the"
    val corpus = (0L until 10L).map(i => (i, nat)) :+ (10L, nat) :+ (11L, shuf)
    val got = run(docs(corpus))
    assert(got(10L)._1 === 7L && got(11L)._1 === 7L) // 9 tokens → 7 trigrams
    assert(got(11L)._2 > got(10L)._2,
      s"shuffled xent ${got(11L)._2} must exceed the natural twin's ${got(10L)._2}")
    assert(got(11L)._4 && !got(10L)._4,
      "the z-flag must fire on the shuffled doc and only on it")
  }

  test("the mixture equals a driver replica on a tiny planted corpus") {
    val corpus = Seq(
      (1L, "a b p q r"), (2L, "a b p q r"), (3L, "s t b c u"), (4L, "a b c"))
    val got = run(docs(corpus))
    // driver replica: all five count tables over the trigram stream
    val tris = corpus.flatMap { case (id, t) =>
      val tk = t.split(" ")
      tk.sliding(3).filter(_.length == 3).map(w => (id, w.toSeq))
    }
    val n = tris.size.toDouble
    def cnt[K](f: Seq[String] => K): Map[K, Int] =
      tris.groupBy(x => f(x._2)).map { case (k, v) => k -> v.size }
    val ct = cnt(identity)
    val cp = cnt(_.take(2)); val cb = cnt(_.drop(1))
    val c2 = cnt(_(1)); val cu = cnt(_(2))
    val expect = tris.groupBy(_._1).map { case (id, g) =>
      val xs = g.map { case (_, w) =>
        -math.log(0.5 * ct(w) / cp(w.take(2)) + 0.3 * cb(w.drop(1)) / c2(w(1)).toDouble +
          0.2 * cu(w(2)) / n)
      }
      id -> BigDecimal(xs.sum / xs.size)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    expect.foreach { case (id, x) =>
      assert(math.abs(got(id)._2 - x) < 2e-6, s"doc $id: ${got(id)._2} vs replica $x")
    }
    // the novel-order doc (common parts, unseen triple) scores worst
    assert(got(4L)._2 === expect.values.max || got(4L)._2 > got(1L)._2)
  }

  test("corpus run: legal probabilities and a non-degenerate flag") {
    val out = TextOps.lmTrigram(spark, TestSpark.Sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getDouble(2) >= 0.0, "xent ≥ 0 ⇔ every p ≤ 1")
      assert(r.getLong(1) >= 1L)
    }
    // z is centered: some docs sit below the mean
    assert(out.count(_.getDouble(3) < 0) > 0)
  }
}
