package graft.operators

import java.security.MessageDigest

import scala.util.Random

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Pins the 64-bit / 4×16-bit-band SimHash geometry:
  *
  *  1. PIGEONHOLE COMPLETENESS — any signature pair within the
  *     verification radius (hamming ≤ 3) collides on at least one of
  *     the 4 bands, so the band-bucket join can never miss a
  *     qualifying pair. Proved over randomized signatures AND shown
  *     tight (4 spread flips can evade all bands — 3 is the largest
  *     radius 4 bands guarantee).
  *  2. VOTE ARITHMETIC — Spark's per-band vote/sign/pack pipeline
  *     reproduces an independent JVM reference bit for bit, so the
  *     oracle SQL and the Spark plan are pinned to the same
  *     fingerprint without waiting for the DuckDB gate.
  *  3. PIPELINE — identical texts pair at hamming 0; sub-shingle docs
  *     are dropped, not crashed.
  */
class SimhashBandSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val Bands = DedupOps.SimBands
  private val BandBits = DedupOps.SimBandBits
  private val Radius = DedupOps.SimHammingMax

  test("geometry: radius is strictly under the band count") {
    assert(Radius < Bands) // the pigeonhole argument below needs this
    assert(Bands * BandBits === 64)
  }

  private def bandsOf(sig: Long): Seq[Long] =
    (0 until Bands).map(i => (sig >>> (BandBits * i)) & ((1L << BandBits) - 1))

  test("pigeonhole: hamming <= 3 implies at least one equal 16-bit band") {
    val rnd = new Random(42)
    (1 to 2000).foreach { _ =>
      val a = rnd.nextLong()
      val flips = rnd.nextInt(Radius + 1) // 0..3 distinct bit positions
      val positions = rnd.shuffle((0 until 64).toList).take(flips)
      val b = positions.foldLeft(a)((acc, p) => acc ^ (1L << p))
      assert(bandsOf(a).zip(bandsOf(b)).exists { case (x, y) => x == y },
        s"no shared band for flips=$positions")
    }
  }

  test("tightness: 4 flips in 4 distinct bands evade every band") {
    val a = 0L
    val b = (0 until Bands).foldLeft(a)((acc, i) => acc ^ (1L << (BandBits * i)))
    assert(!bandsOf(a).zip(bandsOf(b)).exists { case (x, y) => x == y })
  }

  // ---- JVM reference of the vote/pack arithmetic ----

  private def md5hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  /** Reference signature as (b0, b1, b2, b3) over the doc's distinct
    * 3-token shingle set. limit -1: Spark's split keeps trailing empty
    * tokens, Scala's default drops them.
    */
  private def refBands(text: String): Seq[Long] = {
    val toks = text.split(" ", -1).toSeq
    val shingles = toks.sliding(3).filter(_.size == 3).map(_.mkString(" ")).toSeq.distinct
    val hs = shingles.map { s =>
      val hex = md5hex(s)
      (java.lang.Long.parseLong(hex.substring(0, 8), 16),
        java.lang.Long.parseLong(hex.substring(8, 16), 16))
    }
    (0 until Bands).map { i =>
      (0 until BandBits).map { j =>
        val g = BandBits * i + j
        val votes = hs.map { case (h1, h2) =>
          val bit = if (g < 32) (h1 >> g) & 1L else (h2 >> (g - 32)) & 1L
          bit * 2L - 1L
        }.sum
        if (votes >= 0) 1L << j else 0L
      }.sum
    }
  }

  test("spark band values match the JVM reference bit for bit") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog near the river bank"),
      (2L, "spark shuffles partition data across executors during wide transformations"),
      (3L, "a a a b b c d e f g h i j k"),
      (4L, "trailing spaces change tokenization semantics  ")) // double space → empty token
    val got = DedupOps.simhashBands(docs.toDF("doc_id", "text"))
      .collect().map(r => r.getLong(0) -> (1 to Bands).map(r.getLong).toSeq).toMap
    docs.foreach { case (id, text) =>
      assert(got(id) === refBands(text), s"doc $id band mismatch")
    }
  }

  test("identical texts pair at hamming 0; short docs are dropped") {
    import spark.implicits._
    val text = "one two three four five six seven eight nine ten eleven twelve"
    val docs = Seq((1L, text), (2L, text), (3L, "too short")).toDF("doc_id", "text")
    val pairs = DedupOps.dedupSimhashFrame(docs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(pairs.toSeq === Seq((1L, 2L, 0)))
  }
}
