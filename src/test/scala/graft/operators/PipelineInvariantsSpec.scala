package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Mathematical invariants of the round-3 pipeline operators —
  * properties that must hold for ANY corpus, checked on the real one.
  */
class PipelineInvariantsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.01"

  test("retention at day offset 0 is exactly 1.0 for every cohort") {
    val rows = CdcOps.retention(spark, sf).collect()
    assert(rows.nonEmpty)
    val day0 = rows.filter(_.getLong(1) == 0L)
    assert(day0.nonEmpty)
    day0.foreach { r =>
      assert(r.getDouble(4) === 1.0, s"cohort ${r.getLong(0)}")
      assert(r.getLong(2) === r.getLong(3)) // active == cohort size
    }
    // rates are monotone-bounded: never above 1, never non-positive
    rows.foreach(r => assert(r.getDouble(4) > 0.0 && r.getDouble(4) <= 1.0))
  }

  test("no zero-norm embedding in the corpus (the NaN-pin data invariant)") {
    // probeTopKDesc pins NaN cosines (zero-norm vectors) to rank LAST
    // via nanvl(-∞); the DuckDB oracles' plain ORDER BY cos DESC would
    // rank a NaN FIRST — the Spark/oracle agreement therefore rests on
    // the corpus containing no zero-norm vector. Pin that invariant at
    // the gate SF so a corpus change surfaces here, not as a silent
    // hash mismatch in whichever ANN query hits it first.
    import org.apache.spark.sql.functions._
    for (dir <- Seq("/root/testdata/sf0.001", sf)) {
      val zero = graft.sources.Tables.embeddings(spark, dir)
        .filter(graft.plans.VectorExpressions.normNative(col("embedding")) === 0.0)
        .count()
      assert(zero === 0L, s"$dir has $zero zero-norm embeddings — the ANN oracle " +
        "ORDER BYs must gain the NaN pin (CASE WHEN isnan(cos) THEN -1e308 END) before this passes")
    }
  }

  test("a FORCED degenerate vector: zero-norm fails LOUDLY, NaN-element ranks LAST per the mini-oracle") {
    // The corpus invariant above keeps degenerate vectors out of the
    // shipped oracles; this test proves the degenerate path itself is
    // not latent, in its two actual shapes:
    //   1. a ZERO-NORM vector makes the cosine division 0/0, which
    //      under Spark 4's default ANSI mode FAILS LOUDLY
    //      (DIVIDE_BY_ZERO) — the engine itself enforces the corpus
    //      invariant; no silent oracle divergence is reachable;
    //   2. a NaN-ELEMENT vector (the one way a NaN cosine can still
    //      arise: NaN propagates through dot and norm, and NaN is not
    //      a zero divisor) flows through the shared ANN ranking and
    //      must rank LAST, agreeing with the mini-oracle that ranks by
    //      the exact CASE the AnnOps comment prescribes for SQL
    //      mirrors (isnan(cos) → -1e308, ties by vec_id).
    import org.apache.spark.sql.functions._
    import spark.implicits._
    def rank(corpus: Seq[(Long, Array[Float])]): Seq[Long] = {
      val e = corpus.toDF("vec_id", "embedding")
        .withColumn("nrm", graft.plans.VectorExpressions.normNative(col("embedding")))
      // the probe IS corpus vector 10 (unit norm) — taken from the
      // frame itself so element types match the production path
      val p = e.filter(col("vec_id") === 10L)
        .select(col("vec_id").as("probe_id"), col("embedding").as("p_emb"), col("nrm").as("p_nrm"))
      val scored = e.crossJoin(broadcast(p))
        .withColumn("cos", graft.plans.VectorExpressions.cosineNative(
          col("p_emb"), col("p_nrm"), col("embedding"), col("nrm")))
      AnnOps.probeTopKDesc(scored, col("cos"), corpus.size, Seq("vec_id"))
        .orderBy("rnk").select("vec_id").as[Long].collect().toSeq
    }
    val base = Seq(
      (10L, Array(1.0f, 0.0f, 0.0f, 0.0f)), // the probe itself (unit norm)
      (12L, Array(0.6f, 0.8f, 0.0f, 0.0f)),
      (13L, Array(-1.0f, 0.0f, 0.0f, 0.0f)),
      (14L, Array(0.0f, 1.0f, 0.0f, 0.0f)))
    // 1. zero-norm: ANSI divide-by-zero, loud — never a silent NaN
    val ex = intercept[Exception](
      rank(base :+ (11L, Array(0.0f, 0.0f, 0.0f, 0.0f))))
    assert(ex.getMessage.contains("DIVIDE_BY_ZERO"),
      s"expected the ANSI divide-by-zero guard, got: ${ex.getMessage}")
    // 2. NaN element: NaN cosine, pinned to rank LAST by nanvl(−∞)
    val corpus = base :+ (11L, Array(Float.NaN, 0.0f, 0.0f, 0.0f))
    val got = rank(corpus)
    val probe = Array(1.0f, 0.0f, 0.0f, 0.0f)
    def cosine(v: Array[Float]): Double = {
      val dot = v.zip(probe).map { case (a, b) => a.toDouble * b.toDouble }.sum
      dot / math.sqrt(v.map(x => x.toDouble * x.toDouble).sum)
    }
    // mini-oracle: ORDER BY CASE WHEN isnan(cos) THEN -1e308 ELSE cos END DESC, vec_id
    val want = corpus.map { case (id, v) =>
      val c = cosine(v)
      (id, if (c.isNaN) -1e308 else c)
    }.sortBy { case (id, c) => (-c, id) }.map(_._1)
    assert(got === want)
    assert(got.last === 11L, "the NaN-cosine vector must rank LAST")
  }

  test("int8 quantization error is bounded by half a scale step per dimension") {
    val rows = AnnOps.quantStats(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (qscale, rmse, maxErr) = (r.getDouble(1), r.getDouble(2), r.getDouble(3))
      assert(qscale > 0.0)
      // |x - round(x/s)*s| <= s/2 always (plus round(6) slack)
      assert(maxErr <= qscale / 2 + 1e-6, s"vec ${r.getLong(0)}")
      assert(rmse <= maxErr + 1e-6)
    }
  }

  test("incremental dedup only emits pairs anchored on a new document") {
    import spark.implicits._
    val isNew = graft.sources.Tables.documents(spark, sf)
      .selectExpr("doc_id",
        "conv(substring(md5(cast(text AS BINARY)), 1, 8), 16, 10) % 10 >= 8 AS n")
      .as[(Long, Boolean)].collect().toMap
    val rows = DedupOps.dedupIncremental(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (a, b) = (r.getLong(0), r.getLong(1))
      assert(isNew(a), s"pair anchor $a is not a new doc")
      // the other side is old, or an EARLIER new arrival
      assert(!isNew(b) || b < a, s"pair ($a, $b) violates the increment order")
    }
  }
}
