package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Structural + recall guards for the IVF-style ANN scale path. */
class AnnIvfSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.01"

  test("IVF returns full top-k per probe and only exact-cosine-verified candidates") {
    val rows = AnnOps.annIvf(spark, sf).collect()
    val byProbe = rows.groupBy(_.getLong(0))
    assert(byProbe.size === 10)
    byProbe.values.foreach { g =>
      assert(g.length === 5)
      assert(g.map(_.getLong(3)).sorted.toSeq === Seq(1L, 2L, 3L, 4L, 5L))
      // ranks ordered by descending cosine
      val ordered = g.sortBy(_.getLong(3)).map(_.getDouble(2))
      assert(ordered.zip(ordered.tail).forall { case (a, b) => a >= b })
    }
  }

  test("cell stats cover every cell, sum to the corpus, and average balance 1.0") {
    val rows = AnnOps.ivfCellStats(spark, sf).collect()
    assert(rows.map(_.getLong(0)).sorted.toSeq === (0L until 16L))
    val n = graft.sources.Tables.embeddings(spark, sf).count()
    assert(rows.map(_.getLong(1)).sum === n)
    // balance = n·k/total, so the mean over cells is exactly 1 (up to
    // the per-cell rounding)
    val meanBalance = rows.map(_.getDouble(3)).sum / rows.length
    assert(math.abs(meanBalance - 1.0) < 1e-4, s"mean balance $meanBalance")
  }

  test("filtered IVF honors the predicate and its recall audit reads a sane number") {
    import org.apache.spark.sql.functions._
    val labelOf = graft.sources.Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("label")).collect()
      .map(r => r.getLong(0) -> r.getAs[Number](1).longValue()).toMap
    // every returned neighbor carries the probe's own label — the
    // predicate is a hard filter, not a soft preference
    AnnOps.annIvfFiltered(spark, sf).collect().foreach { r =>
      val (probe, vec) = (r.getLong(0), r.getLong(1))
      assert(labelOf(vec) === labelOf(probe), s"probe $probe got label ${labelOf(vec)}")
      assert(vec !== probe)
    }
    // the audit: every probe reports, recall ∈ (0, 1], denominators
    // are the probe's actual filtered-truth size
    val audit = AnnOps.annFilteredRecall(spark, sf).collect()
    assert(audit.length === 10)
    audit.foreach { r =>
      assert(r.getLong(1) >= r.getLong(2))
      assert(r.getDouble(3) >= 0.0 && r.getDouble(3) <= 1.0)
    }
    // the adaptive-nprobe dial's contract: mean filtered recall back
    // in the unfiltered band (measured 0.92 here, 1.00 at sf0.1 —
    // fixed nprobe=4 read 0.62)
    assert(audit.map(_.getDouble(3)).sum / audit.length >= 0.85,
      "mean filtered recall fell out of the >=0.85 band — the adaptive nprobe dial regressed")
  }

  test("adaptive nprobe dial: integer rule np = min{np : np^2*n_label >= nprobe^2*n_total}, clamped") {
    import org.apache.spark.sql.functions._
    val e = graft.sources.Tables.embeddings(spark, sf)
    val nTotal = e.count()
    val labCounts = e.groupBy("label").agg(count(lit(1)).as("n")).collect()
      .map(r => r.getAs[Number](0).longValue() -> r.getLong(1)).toMap
    def expectedNp(nLabel: Long): Int =
      (4 to 16).find(i => i.toLong * i * nLabel >= 16L * nTotal).getOrElse(16)
    // the PRODUCTION dial, not a test-side replica: filteredNprobeDial
    // must reproduce the integer rule exactly for every label
    val dial = AnnOps.filteredNprobeDial(
        e.select(col("vec_id"), col("embedding"), col("label")))
      .collect().map(r => r.getAs[Number](0).longValue() -> r.getInt(1)).toMap
    assert(dial.keySet === labCounts.keySet)
    dial.foreach { case (l, np) =>
      assert(np === expectedNp(labCounts(l)), s"label $l: dial $np")
      assert(np >= 4 && np <= 16)
    }
    // with ~10% selectivity per label the 1/sqrt(sel) rule lands at
    // 12-14 cells — adaptive (not the fixed 4) and not the degenerate
    // all-cells scan
    assert(dial.values.forall(np => np > 4 && np < 16), s"dial degenerated: $dial")
  }

  test("filtered-search preflight: shares sum to 1 per cell, populations sum to the corpus") {
    val rows = AnnOps.annIvfFilteredPreflight(spark, sf).collect()
    assert(rows.nonEmpty)
    val n = graft.sources.Tables.embeddings(spark, sf).count()
    assert(rows.map(_.getLong(2)).sum === n, "every vector is counted exactly once")
    rows.groupBy(_.getLong(0)).foreach { case (cell, g) =>
      assert(math.abs(g.map(_.getDouble(4)).sum - 1.0) < 1e-4, s"cell $cell shares")
      val nCell = g.head.getLong(3)
      assert(g.map(_.getLong(2)).sum === nCell, s"cell $cell population")
    }
  }

  test("IVF recall overlaps the exact top-k (approximate, nprobe/cells of the corpus)") {
    val exact = AnnOps.annTopK(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = AnnOps.annIvf(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = ivf.intersect(exact).size.toDouble / exact.size
    // 4 of 16 cells searched; random embeddings are a worst case for
    // coarse quantization — require meaningful, not perfect, recall
    assert(recall > 0.2, s"recall@5 = $recall")
  }
}
