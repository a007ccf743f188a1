package graft.operators

import java.security.MessageDigest

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The incremental decontamination's contract beyond the hash gate:
  * registered incremental ≡ registered batch on executed plans, the
  * retroactive-boilerplate demotion pinned on a planted frame (a
  * delta arrival pushing a shared gram over the df cap REMOVES a base
  * doc's evidence), cross-boundary contamination (a delta bench doc
  * flags a base train doc), and the pass-through path genuinely
  * carrying unchanged stored rows.
  */
class ContamIncrementalSpec extends AnyFunSuite {

  private val spark = TestSpark.spark
  import spark.implicits._

  test("incremental ≡ the registered batch pass on executed plans (two SFs)") {
    Seq(TestSpark.Sf, "/root/testdata/sf0.01").foreach { sf =>
      val full = CorpusOps.contamination(spark, sf).collect()
        .map(_.toSeq).toSet
      val inc = CorpusOps.contamIncremental(spark, sf).collect()
        .map(_.toSeq).toSet
      assert(inc === full, sf)
    }
  }

  // ---- planted-frame machinery -------------------------------------
  // bench membership is the content-hash 5% slice; pad each planted
  // text deterministically until its hash lands on the wanted side
  private def bucketOf(t: String): Long = {
    val d = MessageDigest.getInstance("MD5")
      .digest(t.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    java.lang.Long.parseLong(d.take(4).map("%02x".format(_)).mkString, 16) % 20
  }
  private def padded(body: String, bench: Boolean): String =
    Iterator.from(0).map(i => s"$body pad$i")
      .find(t => (bucketOf(t) == 0) == bench).get

  private val Gram = "t1 t2 t3 t4 t5 t6 t7 t8"   // the shared 8-token window
  private val Gram2 = "u1 u2 u3 u4 u5 u6 u7 u8"

  /** ids 1-3 are the base slice, 2000+ the delta (cut lands between):
    * 1 = base TRAIN doc whose only evidence is Gram shared with base
    * bench doc 2; 3 = base train doc carrying Gram2 (no bench partner
    * in base); 2000 = DELTA BENCH doc carrying Gram2; 2001 = delta
    * train doc carrying Gram2; 2010+ = fillers carrying Gram (their
    * tail windows embed a unique token, so Gram is the only shared
    * gram they contribute).
    */
  private def planted(nFillers: Int) = {
    val rows =
      Seq(
        (1L, padded(s"$Gram alpha beta", bench = false)),
        (2L, padded(s"$Gram gamma delta", bench = true)),
        (3L, padded(s"$Gram2 epsilon zeta", bench = false)),
        (2000L, padded(s"$Gram2 eta theta", bench = true)),
        (2001L, padded(s"$Gram2 iota kappa", bench = false))) ++
      (0 until nFillers).map(i => (2010L + i, s"$Gram filler$i"))
    rows.toDF("doc_id", "text")
  }

  test("below the df cap, the planted evidence flags docs 1, 3 and 2001") {
    // 100 fillers: df(Gram) = 102 ≤ 1000, so Gram stays kept and base
    // doc 1 is contaminated via base bench doc 2; Gram2 evidence
    // arrives ACROSS THE BOUNDARY (delta bench doc 2000 flags base
    // train doc 3) and delta-internally (doc 2001)
    val out = CorpusOps.contamIncrementalFrom(planted(100))._2
      .select($"doc_id", $"n_grams", $"n_bench").as[(Long, Long, Long)]
      .collect().map(r => r._1 -> ((r._2, r._3))).toMap
    // fillers sharing Gram with bench doc 2 are contaminated too —
    // restrict the assertion to the planted actors
    // ~5% of fillers hash into the bench slice and also carry Gram, so
    // doc 1's bench-partner count is ≥ 1 (doc 2) but not exactly 1;
    // its evidence-gram count stays exactly Gram alone
    assert(out.get(1L).exists { case (g, b) => g == 1L && b >= 1L },
      s"base doc 1 via bench partners sharing Gram: ${out.get(1L)}")
    assert(out.get(3L) === Some((1L, 1L)), "cross-boundary: delta bench flags base train")
    assert(out.get(2001L) === Some((1L, 1L)), "delta-internal evidence")
    assert(!out.contains(2L) && !out.contains(2000L), "bench docs never appear")
  }

  test("retroactive boilerplate: delta arrivals push the gram over the cap and DEMOTE base evidence") {
    // 1100 fillers: df(Gram) = 1102 > 1000 — Gram becomes hot, so base
    // doc 1 (whose ONLY evidence was Gram) must drop out of the
    // maintained result even though nothing about doc 1 changed; the
    // Gram2 evidence is unaffected
    val out = CorpusOps.contamIncrementalFrom(planted(1100))._2
      .select($"doc_id").as[Long].collect().toSet
    assert(!out.contains(1L), "late-discovered boilerplate must demote base evidence")
    assert(out.contains(3L) && out.contains(2001L))
    assert(out.forall(id => id == 3L || id == 2001L),
      s"hot-gram evidence must vanish corpus-wide, got $out")
  }

  test("the pass-through path carries unchanged stored rows at sf0.1") {
    val docs = graft.sources.Tables.documents(spark, "/root/testdata/sf0.1")
    val (affected, out) = CorpusOps.contamIncrementalFrom(docs)
    val affectedIds = affected.select($"doc_id".cast("long")).as[Long].collect().toSet
    val outIds = out.select($"doc_id".cast("long")).as[Long].collect().toSet
    assert(affectedIds.nonEmpty)
    val passedThrough = outIds -- affectedIds
    assert(passedThrough.nonEmpty,
      "no unchanged base row passed through — the incremental split is degenerate")
    assert((outIds -- passedThrough).nonEmpty,
      "no re-evaluated row — the delta did no work")
  }
}
