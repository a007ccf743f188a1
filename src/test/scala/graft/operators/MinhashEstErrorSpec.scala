package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Estimator-audit contracts: exact duplicates estimate 1 with zero
  * error, the audit covers every pair the thresholded minhash dedup
  * accepts (same blocking), and the estimate is always n_match/8 on
  * the same signatures the banding used.
  */
class MinhashEstErrorSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf01 = "/root/testdata/sf0.01"

  private def onDocs(docs: Seq[(Long, String)]) = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("mhesterr").toString
    docs.toDF("doc_id", "text").write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    DedupOps.minhashEstError(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))).toMap
  }

  test("an exact duplicate pair estimates 1.0 with zero error") {
    val text = "the quick brown fox jumps over the lazy dog again and again"
    val rows = onDocs(Seq((1L, text), (2L, text),
      (3L, "completely unrelated filler words about oceans and rivers flowing")))
    val (nMatch, est, jac, err) = rows((1L, 2L))
    assert(nMatch === 8L && est === 1.0 && jac === 1.0 && err === 0.0)
    assert(!rows.contains((1L, 3L)) && !rows.contains((2L, 3L)))
  }

  test("estimate is n_match/8 and error is |est - jac| on every audited pair") {
    val rows = onDocs(Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (2L, "alpha beta gamma delta epsilon zeta eta theta different ending"),
      (3L, "alpha beta gamma delta epsilon zeta eta theta iota kappa")))
    assert(rows.nonEmpty)
    rows.foreach { case (pair, (nMatch, est, jac, err)) =>
      assert(nMatch >= 0L && nMatch <= 8L)
      assert(est === BigDecimal(nMatch / 8.0).setScale(6,
        BigDecimal.RoundingMode.HALF_UP).toDouble, s"pair $pair")
      assert(math.abs(err - math.abs(est - jac)) < 2e-6, s"pair $pair")
      assert(jac >= 0.0 && jac <= 1.0)
    }
  }

  test("the audit covers every pair the thresholded minhash dedup accepts, at sf0.01") {
    val audited = DedupOps.minhashEstError(spark, sf01).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(4))).toMap
    val accepted = DedupOps.dedupMinhash(spark, sf01).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(accepted.nonEmpty)
    accepted.foreach { case (pair, jac) =>
      assert(audited.contains(pair), s"accepted pair $pair missing from audit")
      assert(audited(pair) === jac, s"pair $pair: jac diverges")
    }
  }
}
