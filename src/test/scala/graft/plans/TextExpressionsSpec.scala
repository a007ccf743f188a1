package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The round-10 native text expressions replaced higher-order-function
  * formulations for PLAN cost, claiming bit-identical semantics. These
  * properties pin that claim directly: for arbitrary token arrays
  * (unicode, empties, repeats, arrays shorter than the window) the
  * native node must equal the HOF expression it replaced, element for
  * element — the class of drift the oracle gate only catches where the
  * shipped corpus happens to exercise the edge.
  */
class TextExpressionsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def samples[A](gen: Gen[A], n: Int = 150): Seq[A] =
    (0 until n).flatMap(i => gen.apply(Gen.Parameters.default, Seed(41L + i)))

  private val tokGen: Gen[String] = Gen.oneOf(
    "the", "café", "李记", "a", "", "nasi", "lemak", "x1", "#7", "Bhd",
    "zzz", "ümlaut", "0", "tok")
  private val arrGen: Gen[Seq[String]] =
    Gen.chooseNum(0, 12).flatMap(n => Gen.listOfN(n, tokGen))

  /** The k-shifted-slice zip_with reduction shingles() used before the
    * native node — kept here verbatim as the semantic reference.
    */
  private def shinglesHof(toks: Column, k: Int): Column = {
    val n = greatest(size(toks) - (k - 1), lit(0))
    val windows = (1 to k).map(off => slice(toks, lit(off), n))
    windows.reduceLeft((acc, next) =>
      zip_with(acc, next, (a, b) => concat_ws(" ", a, b)))
  }

  /** The transform+array_min formulation minhash() used before. */
  private def minhashHof(arr: Column, seed: Int): Column =
    array_min(transform(arr, s => md5(concat(lit(s"$seed:"), s).cast("binary"))))

  test("ShinglesExpr equals the zip_with formulation for arbitrary arrays and k") {
    import spark.implicits._
    val df = samples(arrGen).toDF("toks")
    for (k <- Seq(1, 2, 3, 4, 8)) {
      val bad = df
        .withColumn("nat", TextExpressions.shinglesNative(col("toks"), k))
        .withColumn("hof", shinglesHof(col("toks"), k))
        .filter(not(col("nat") <=> col("hof")))
      assert(bad.count() === 0, s"k=$k: native shingles diverge from HOF form")
    }
  }

  test("MinHashExpr equals the transform+array_min formulation, incl. empty arrays") {
    import spark.implicits._
    val df = samples(arrGen).toDF("toks")
      .withColumn("sh", TextExpressions.shinglesNative(col("toks"), 3))
    for (seed <- Seq(0, 1, 17)) {
      val bad = df
        .withColumn("nat", TextExpressions.minhashNative(col("sh"), s"$seed:"))
        .withColumn("hof", minhashHof(col("sh"), seed))
        .filter(not(col("nat") <=> col("hof")))
      assert(bad.count() === 0, s"seed=$seed: native minhash diverges from HOF form")
    }
  }

  test("ChunkHashesExpr: chunks concatenate back to the document and split on flagged windows") {
    import spark.implicits._
    // cross-check the chunker against first principles rather than the
    // (retired) array formulation: chunk hashes must equal md5 of the
    // slices delimited by {0} ∪ {p ≥ 1 : hex32(md5(window at p)) % div = 0},
    // computed here with independent Spark SQL primitives per row
    val k = 4
    val div = 4 // denser boundaries than production so splits actually occur
    val df = samples(arrGen, 120).toDF("toks")
      .withColumn("chs", TextExpressions.chunkHashesNative(col("toks"), k, div))
    val rows = df.select("toks", "chs").collect()
    val md = java.security.MessageDigest.getInstance("MD5")
    def md5hex(s: String): String =
      md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    rows.foreach { r =>
      val toks = r.getSeq[String](0)
      val n = toks.length
      val flagged = (1 until math.max(n - (k - 1), 0)).filter { p =>
        val h = java.lang.Long.parseLong(
          md5hex(toks.slice(p, p + k).mkString(" ")).substring(0, 8), 16)
        h % div == 0
      }
      val starts = 0 +: flagged
      val ends = starts.drop(1) :+ n
      val want = starts.zip(ends).map { case (s, e) => md5hex(toks.slice(s, e).mkString(" ")) }
      assert(r.getSeq[String](1) === want, s"toks=$toks")
    }
  }
}
