package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.sources.Tables

/** Semantics guards for the two curation-scoring additions: the
  * Gopher rule set (first-failing-rule discipline) and DSIR hashed
  * n-gram importance weights (domain-preference property + exact
  * feature accounting).
  */
class GopherDsirSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.01"

  test("gopher: keep == (reason == ok) and every reason re-derives from its own stats") {
    val rows = TextOps.gopherRules(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nw, ml, af, st) = (r.getAs[Long]("n_words"),
        r.getAs[Double]("mean_word_len"), r.getAs[Double]("alpha_frac"),
        r.getAs[Long]("req_stops"))
      val expect =
        if (nw < 20 || nw > 100000) "word_count"
        else if (ml < 3.0 || ml > 10.0) "mean_word_len"
        else if (af < 0.8) "low_alpha"
        else if (st < 1) "low_stopwords"
        else "ok"
      assert(r.getAs[String]("reason") === expect)
      assert(r.getAs[Boolean]("keep") === (expect == "ok"))
    }
    // the rule set must actually discriminate on this corpus
    assert(rows.exists(_.getAs[Boolean]("keep")))
    assert(rows.exists(!_.getAs[Boolean]("keep")))
  }

  test("dsir: n_feats is exactly unigrams + bigrams per document") {
    val truth = Tables.documents(spark, sf)
      .select(col("doc_id"), size(split(col("text"), " ")).cast("long").as("nw"))
    val mismatches = CorpusOps.dsirWeights(spark, sf)
      .join(truth, "doc_id")
      .filter(col("n_feats") =!= col("nw") * 2 - 1)
      .count()
    assert(mismatches === 0L)
  }

  test("dsir: target-source documents score higher on average than the rest") {
    val w = CorpusOps.dsirWeights(spark, sf)
      .join(Tables.documents(spark, sf).select("doc_id", "source"), "doc_id")
    val Array(tgt, rest) = w
      .groupBy((col("source") === "src1").as("is_tgt"))
      .agg(avg(col("logw")).as("m"))
      .orderBy(col("is_tgt").desc)
      .collect()
      .map(_.getAs[Double]("m"))
    assert(tgt > rest,
      s"importance weights must prefer the target domain: tgt=$tgt rest=$rest")
  }
}
