package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Poisson-bootstrap contracts: the md5-derived weights follow the
  * embedded inverse-CDF table exactly (JVM replica), a constant
  * metric collapses the interval to a point, and real-corpus
  * intervals are ordered and fully resampled.
  */
class BootstrapCiSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def run(docs: Seq[(Long, String, Long)]) = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("bootci").toString
    docs.toDF("doc_id", "lang", "n_chars").write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    CorpusOps.bootstrapCi(spark, dir).collect()
  }

  test("weight thresholds follow Poisson(1): P(w=0) ≈ 1/e over the hash-uniforms") {
    // JVM replica of the (doc_id, b) → w arithmetic over many cells
    def w(docId: Long, b: Int): Int = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$docId:$b".getBytes("UTF-8"))
      val u = java.lang.Long.parseLong(d.take(4).map(x => f"$x%02x").mkString, 16)
      CorpusOps.PoisThresholds.count(u >= _)
    }
    val ws = for (id <- 0L until 500L; b <- 0 until CorpusOps.BootB) yield w(id, b)
    val n = ws.size.toDouble
    assert(math.abs(ws.count(_ == 0) / n - math.exp(-1)) < 0.01)
    assert(math.abs(ws.count(_ == 1) / n - math.exp(-1)) < 0.01)
    assert(math.abs(ws.sum / n - 1.0) < 0.01) // E[w] = 1
    assert(ws.max <= 8)
  }

  test("a constant metric collapses the interval to the point estimate") {
    val rows = run((1L to 40L).map(i => (i, "en", 777L)))
    assert(rows.length === 1)
    val r = rows(0)
    assert(r.getLong(1) === 40L)              // n_docs
    assert(r.getDouble(2) === 777.0)          // mean
    assert(r.getDouble(3) === 777.0)          // ci_lo
    assert(r.getDouble(4) === 777.0)          // ci_hi
    assert(r.getLong(5) === CorpusOps.BootB.toLong)
  }

  test("real corpus: intervals are ordered, bracket the mean, and use all resamples") {
    val rows = CorpusOps.bootstrapCi(spark, "/root/testdata/sf0.001").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (mean, lo, hi) = (r.getDouble(2), r.getDouble(3), r.getDouble(4))
      assert(lo <= hi, s"${r.getString(0)}: ci_lo > ci_hi")
      assert(lo <= mean && mean <= hi,
        s"${r.getString(0)}: point $mean outside [$lo, $hi]")
      assert(r.getLong(5) === CorpusOps.BootB.toLong)
    }
  }
}
