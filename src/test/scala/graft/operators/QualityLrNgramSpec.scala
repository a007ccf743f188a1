package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The hashed-n-gram quality classifier's contracts: the distributed
  * 132-weight INTEGER GD loop (one LrGradAgg aggregate per step) must
  * equal an independent driver-side BigInt replica weight for weight;
  * the n-gram model must beat the 4-scalar-feature model's HELD-OUT
  * accuracy (it sees strictly more signal — the reason a curation
  * pipeline distills into hashed n-grams at all); and the served
  * probabilities must replay through a driver sigmoid replica. The
  * replica shares NOTHING with the production path but the table
  * constants.
  */
class QualityLrNgramSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.01"
  private val Dim = TextOps.NgramDim

  /** Driver sigmoid replica over a dense feature vector. */
  private def pm(w: Array[Long], xs: Seq[Long]): Long = {
    val tab = TextOps.SigTable
    var s = w(0) * 1000000L
    var i = 0
    while (i < xs.length) { s += w(i + 1) * xs(i); i += 1 }
    val z = Math.floorDiv(s, 1000000L)
    val zc = math.max(TextOps.SigLoMicro, math.min(TextOps.SigHiMicro, z))
    val off = zc - TextOps.SigLoMicro
    val idx = (off / TextOps.SigStep).toInt
    tab(idx) + (tab(idx + 1) - tab(idx)) * (off % TextOps.SigStep) / TextOps.SigStep
  }

  private def rhu(num: BigInt, den: BigInt): BigInt = {
    val a = num * 2 + den
    val b = den * 2
    (a - a.mod(b)) / b
  }

  /** Driver GD replica over collected (xs, y) rows. */
  private def trainReplica(rows: Array[(Seq[Long], Double)], dim: Int,
      steps: Int): Array[Long] = {
    var w = new Array[Long](dim + 1)
    for (_ <- 1 to steps) {
      val g = Array.fill(dim + 1)(BigInt(0))
      rows.foreach { case (xs, y) =>
        val d = BigInt(pm(w, xs) - y.toLong * 1000000L)
        g(0) += d
        var b = 0
        while (b < dim) { g(b + 1) += d * xs(b); b += 1 }
      }
      val n = BigInt(rows.length)
      w = Array.tabulate(dim + 1) { j =>
        val den = if (j == 0) n else n * 1000000L
        w(j) - TextOps.LrRate * rhu(g(j), den).toLong
      }
    }
    w
  }

  private def collected(df: org.apache.spark.sql.DataFrame): Array[(Seq[Long], Double)] =
    df.select("xs", "y").collect()
      .map(r => (r.getSeq[Long](0), r.getDouble(1)))

  test("distributed 132-weight training equals the driver BigInt replica") {
    val expected = trainReplica(collected(TextOps.lrNgramFeatures(spark, sf)), Dim, TextOps.NgramSteps)
    val got = TextOps.qualityLrNgram(spark, sf).orderBy("feat").collect()
    assert(got.length === Dim + 1)
    got.zipWithIndex.foreach { case (r, j) =>
      assert(r.getLong(0) === j - 1L)
      assert(r.getLong(1) === expected(j), s"weight $j diverges")
    }
  }

  test("the n-gram model beats the 4-feature model on HELD-OUT accuracy") {
    // deterministic content split: train on ~70%, hold out the rest
    val ngramAll = TextOps.lrNgramFeatures(spark, sf)
      .withColumn("hold", CorpusOps.bucket(col("doc_id").cast("string"), 10) >= 7)
    // the 4-feature model as a trainVec instance (same trainer, dim 3)
    val scalarAll = graft.sources.Tables.documents(spark, sf)
      .select(col("doc_id"),
        array(TextOps.lrX1m, TextOps.lrX2m, TextOps.lrX3m).as("xs"),
        when(TextOps.qualityCol >= TextOps.LrThreshold, 1.0).otherwise(0.0).as("y"))
      .withColumn("hold", CorpusOps.bucket(col("doc_id").cast("string"), 10) >= 7)
    def acc(all: org.apache.spark.sql.DataFrame, dim: Int, steps: Int): Double = {
      val w = TextOps.trainVec(all.filter(!col("hold")).select("xs", "y"), dim, steps)
      val test = collected(all.filter(col("hold")).select("xs", "y"))
      test.count { case (xs, y) => (pm(w, xs) >= 500000L) == (y == 1.0) }.toDouble / test.length
    }
    val ngramAcc = acc(ngramAll, Dim, TextOps.NgramSteps)
    val scalarAcc = acc(scalarAll, 3, TextOps.LrSteps)
    assert(ngramAcc > scalarAcc,
      s"held-out: ngram $ngramAcc should beat 4-feature $scalarAcc")
  }

  test("served probabilities replay through the driver sigmoid") {
    val wRows = TextOps.qualityLrNgram(spark, sf).orderBy("feat").collect()
    val w = wRows.map(_.getLong(1))
    val feats = collected(TextOps.lrNgramFeatures(spark, sf).orderBy("doc_id"))
    val served = TextOps.qualityLrNgramScore(spark, sf).orderBy("doc_id").collect()
    assert(served.length === feats.length)
    served.zip(feats).foreach { case (r, (xs, y)) =>
      val p = pm(w, xs)
      assert(r.getDouble(1) === p / 1e6)
      assert(r.getBoolean(2) === (p >= 500000L))
      assert(r.getBoolean(3) === (y == 1.0))
    }
    // and the classifier is non-degenerate: both decisions occur
    assert(served.count(_.getBoolean(2)) > 0 && served.count(!_.getBoolean(2)) > 0)
  }
}
