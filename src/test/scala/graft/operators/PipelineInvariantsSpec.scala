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
