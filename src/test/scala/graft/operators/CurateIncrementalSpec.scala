package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The incremental curation pipeline's contract beyond the hash gate:
  * registered incremental ≡ registered batch on executed plans, the
  * cross-boundary dedup rule pinned on a planted frame (the gate
  * corpus only exercises it at sf0.1), and the cap merge doing REAL
  * work corpus-wide (delta docs enter the final cap; at sf0.1, base
  * docs are genuinely evicted by delta competition).
  */
class CurateIncrementalSpec extends AnyFunSuite {

  private val spark = TestSpark.spark
  import spark.implicits._

  test("incremental ≡ the registered batch pipeline on executed plans (two SFs)") {
    Seq(TestSpark.Sf, "/root/testdata/sf0.01").foreach { sf =>
      val full = CorpusOps.curateE2e(spark, sf).collect().map(_.toSeq).toSet
      val inc = CorpusOps.curateIncremental(spark, sf).collect().map(_.toSeq).toSet
      assert(inc === full, sf)
      assert(inc.nonEmpty, sf)
    }
  }

  test("cross-boundary dedup: a delta re-occurrence of a base hash is dropped") {
    // ids 1..6 are the base slice (cut = (1+12)/2 = 6), 7..12 the
    // delta; doc 8 is a normalization-equal duplicate of base doc 2,
    // doc 9 a fresh control. Zero weights make every doc pass the
    // quality gate at exactly p = 0.5 (ties broken by doc_id), and
    // the contaminated-id artifact is empty — isolating the dedup rule.
    val texts = Map(
      2L -> "Alpha Beta Gamma Delta",
      8L -> "alpha  BETA gamma   delta", // normalizes to doc 2's text
      9L -> "a genuinely fresh delta document")
    val docs = (1L to 12L).map { id =>
      val t = texts.getOrElse(id, s"simple document number $id with its own words")
      (id, t, "s1", "en", t.length)
    }.toDF("doc_id", "text", "source", "lang", "n_chars")
    // the planted corpus must not accidentally land in the bench
    // slice (content-hash 5%) — deterministic, so this never flakes
    val bench = docs.filter(
      conv(substring(md5(col("text").cast("binary")), 1, 8), 16, 10)
        .cast("long") % 20 === 0).count()
    assert(bench === 0, "planted texts hash into the bench slice; adjust the wording")
    val emptyContam = Seq.empty[Long].toDF("doc_id")
    val (_, out) = CorpusOps.curateIncrementalFrom(docs, Array(0L, 0L, 0L, 0L), emptyContam)
    val ids = out.select("doc_id").as[Long].collect().toSet
    assert(!ids.contains(8L), "the cross-boundary duplicate must be dropped")
    assert(ids.contains(9L), "the fresh delta doc must survive")
    assert(ids === (1L to 12L).toSet - 8L)
  }

  test("the cap merge does real work: delta docs enter the cap; sf0.1 evicts base docs") {
    // sf0.01: delta survivors reach the final output (the merge is
    // not pass-through); sf0.1 additionally shows genuine EVICTION —
    // base docs that the base-only cap kept lose their slot to
    // higher-quality delta arrivals
    Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1").foreach { sf =>
      val docs = graft.sources.Tables.documents(spark, sf)
      val w = TextOps.lrWeights(spark, sf)
      val contam = CorpusOps.contamination(spark, sf).select("doc_id")
      val (baseCapped, out) = CorpusOps.curateIncrementalFrom(docs, w, contam)
      val cutId = docs.agg(
        ((min(col("doc_id")) + max(col("doc_id"))) / 2).cast("long")).as[Long].head()
      val outIds = out.select("doc_id").as[Long].collect().toSet
      assert(outIds.exists(_ > cutId), s"$sf: no delta doc in the final cap")
      val evicted = baseCapped.select("doc_id").as[Long].collect().toSet -- outIds
      if (sf.endsWith("0.1"))
        assert(evicted.nonEmpty, "sf0.1: expected real cap evictions")
    }
  }
}
