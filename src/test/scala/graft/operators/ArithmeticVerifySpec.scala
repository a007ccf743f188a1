package graft.operators

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.functions.Hashing

/** Property tests for the arithmetic pair-verification machinery: the
  * binomial inversion that replaces array re-joins, and the per-row
  * bigram/shingle constructions that replace exploded self-joins.
  */
class ArithmeticVerifySpec extends AnyFunSuite {

  /** Deterministic manual sampling (no scalatest-scalacheck bridge in
    * the offline cache): 100 cases per property, fixed seed.
    */
  private def forAllSampled[A](gen: Gen[A])(body: A => Unit): Unit =
    (0 until 100).foreach { i =>
      gen.apply(Gen.Parameters.default, Seed(42L + i)).foreach(body)
    }
  private lazy val spark = TestSpark.spark

  test("interFromNc inverts C(inter, 2) exactly for every realistic intersection size") {
    import spark.implicits._
    val rows = (2 to 2000).map(i => (i, i.toLong * (i - 1) / 2)).toDF("inter", "nc")
    val bad = rows.filter(FuzzyOps.interFromNc(col("nc")) =!= col("inter")).count()
    assert(bad === 0)
  }

  test("interUbFromNc is the tight floor: UB(C(i,2)) = i and UB(C(i,2) - 1) = i - 1") {
    import spark.implicits._
    val rows = (3 to 2000).map(i => (i, i.toLong * (i - 1) / 2)).toDF("inter", "nc")
    assert(rows.filter(FuzzyOps.interUbFromNc(col("nc")) =!= col("inter")).count() === 0)
    assert(rows.filter(FuzzyOps.interUbFromNc(col("nc") - 1) =!= col("inter") - 1).count() === 0)
  }

  test("interFromNc3 inverts C(inter, 3) exactly for every realistic intersection size") {
    import spark.implicits._
    val rows = (3 to 2000).map(i => (i, i.toLong * (i - 1) * (i - 2) / 6)).toDF("inter", "nc")
    val bad = rows.filter(FuzzyOps.interFromNc3(col("nc")) =!= col("inter")).count()
    assert(bad === 0)
  }

  test("interUbFromNc3 bounds: UB(C(i,3)) >= i and UB(C(i,3) - 1) >= i - 1") {
    import spark.implicits._
    // a sound upper bound may overestimate but must never go below the
    // largest inter consistent with the co-count
    val rows = (4 to 2000).map(i => (i, i.toLong * (i - 1) * (i - 2) / 6)).toDF("inter", "nc")
    assert(rows.filter(FuzzyOps.interUbFromNc3(col("nc")) < col("inter")).count() === 0)
    assert(rows.filter(FuzzyOps.interUbFromNc3(col("nc") - 1) < col("inter") - 1).count() === 0)
  }

  private val tokenGen: Gen[Seq[String]] =
    Gen.choose(0, 10).flatMap(n => Gen.listOfN(n, Gen.oneOf(
      "alpha", "beta", "gamma", "delta", "eps", "zeta", "eta", "theta", "iota", "kappa")))

  test("bigramsOf equals the naive sorted-pair set of the distinct tokens") {
    import spark.implicits._
    forAllSampled(tokenGen) { toks =>
      val got = Seq(toks).toDF("raw")
        .select(FuzzyOps.bigramsOf(array_distinct(col("raw"))).as("bg"))
        .head.getSeq[String](0).toSet
      val distinct = toks.distinct.sorted
      val want = (for {
        i <- distinct.indices; j <- (i + 1) until distinct.length
      } yield s"${distinct(i)} ${distinct(j)}").toSet
      assert(got === want)
    }
  }

  test("trigramsOf equals the naive sorted-triple set of the distinct tokens") {
    import spark.implicits._
    forAllSampled(tokenGen) { toks =>
      val got = Seq(toks).toDF("raw")
        .select(FuzzyOps.trigramsOf(array_distinct(col("raw"))).as("tg"))
        .head.getSeq[String](0).toSet
      val distinct = toks.distinct.sorted
      val want = (for {
        i <- distinct.indices; j <- (i + 1) until distinct.length
        l <- (j + 1) until distinct.length
      } yield s"${distinct(i)} ${distinct(j)} ${distinct(l)}").toSet
      assert(got === want)
    }
  }

  test("shingles equals the naive k-token sliding window") {
    import spark.implicits._
    forAllSampled(tokenGen.flatMap(t => Gen.choose(2, 4).map((t, _)))) { case (toks, k) =>
      val got = Seq(toks).toDF("raw")
        .select(Hashing.shingles(col("raw"), k).as("sh"))
        .head.getSeq[String](0).toList
      val want = if (toks.length < k) Nil else toks.sliding(k).map(_.mkString(" ")).toList
      assert(got === want)
    }
  }
}
