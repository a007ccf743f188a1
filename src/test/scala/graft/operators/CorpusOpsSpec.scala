package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Semantics guards for the corpus-curation additions. */
class CorpusOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.01"

  test("contamination flags only training docs, never the benchmark slice itself") {
    import spark.implicits._
    val flagged = CorpusOps.contamination(spark, sf).select("doc_id").as[Long].collect().toSet
    assert(flagged.nonEmpty, "sf0.01 corpus contains near-dups of benchmark docs")
    val benchIds = graft.sources.Tables.documents(spark, sf)
      .filter(conv(substring(md5(col("text").cast("binary")), 1, 8), 16, 10)
        .cast("long") % 20 === 0)
      .select("doc_id").as[Long].collect().toSet
    assert(flagged.intersect(benchIds).isEmpty)
  }

  test("group sample returns exactly k real docs per source, deterministically") {
    import org.apache.spark.sql.functions._
    val rows = CorpusOps.groupSample(spark, sf).collect()
    val sources = graft.sources.Tables.documents(spark, sf)
      .select(col("source")).distinct().collect().map(_.getString(0)).toSet
    val bySource = rows.groupBy(_.getString(0))
    assert(bySource.keySet === sources, "every source must be sampled")
    bySource.foreach { case (s, g) =>
      assert(g.length === 3, s"source $s: ${g.length} rows")
      assert(g.map(_.getLong(3)).sorted.toSeq === Seq(1L, 2L, 3L))
    }
    // sampled ids are real members of their source
    val membership = graft.sources.Tables.documents(spark, sf)
      .select(col("doc_id"), col("source")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    rows.foreach(r => assert(membership(r.getLong(1)) === r.getString(0)))
    // reshuffle-stable: a repartitioned second run picks the same docs
    val again = CorpusOps.groupSample(spark, sf).collect()
    assert(again.map(r => (r.getString(0), r.getLong(1), r.getLong(3))).toSet ===
      rows.map(r => (r.getString(0), r.getLong(1), r.getLong(3))).toSet)
  }

  test("mixture weights invert the actual shares toward a uniform target") {
    val rows = CorpusOps.mixtureWeights(spark, sf).collect()
    val nLangs = rows.length
    rows.foreach { r =>
      val actual = r.getAs[Double]("actual_frac")
      val weight = r.getAs[Double]("weight")
      // weight ≈ (1/nLangs) / actual, up to the independent round(6)s
      assert(math.abs(weight - (1.0 / nLangs) / actual) < 1e-4)
    }
    // expected post-sampling share is uniform: actual × weight ≈ 1/n
    val mixed = rows.map(r => r.getAs[Double]("actual_frac") * r.getAs[Double]("weight"))
    mixed.foreach(m => assert(math.abs(m - 1.0 / nLangs) < 1e-4))
  }
}
