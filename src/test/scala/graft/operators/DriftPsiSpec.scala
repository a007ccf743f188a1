package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The drift-telemetry contract beyond the hash gate: a PLANTED
  * distribution shift yields exactly the closed-form PSI (replica of
  * the smoothed formula computed independently in Scala), an
  * un-shifted frame reads ~0 and undrifted, and the readout is
  * invariant to input partitioning (shard-merge invariance — the
  * histogram is the only corpus-wide state, and counts merge
  * associatively).
  */
class DriftPsiSpec extends AnyFunSuite {

  private val spark = TestSpark.spark
  import spark.implicits._

  // 200 docs, identical text everywhere (so every non-lang feature is
  // a single bin on both halves → PSI 0); the LANG flips en → fr at
  // the midpoint cut (ids 1..100 base, 101..200 delta)
  private def planted() = (1L to 200L).map { id =>
    (id, "ten short words make up this deterministic document body x",
      if (id <= 100L) "en" else "fr", "web", 58L)
  }.toDF("doc_id", "text", "lang", "source", "n_chars")

  test("a planted lang flip yields the closed-form smoothed PSI and trips the alert") {
    val out = CorpusOps.driftPsiFrom(planted()).collect()
      .map(r => r.getString(0) -> r).toMap
    // independent replica: bins {en, fr}, totals 100/100, Laplace
    // smoothing (n+1)/(tot+2), contributions decided in nano-units
    def p(n: Long) = (n + 1).toDouble / 102.0
    val nano = Seq((100L, 0L), (0L, 100L)).map { case (b, d) =>
      math.round((p(b) - p(d)) * math.log(p(b) / p(d)) * 1e9)
    }.sum
    val expected = BigDecimal(nano / 1e9)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val lang = out("lang")
    assert(lang.getLong(1) === 2L, "bin inventory {en, fr}")
    assert(lang.getDouble(4) === expected)
    assert(lang.getBoolean(5), "a full lang swap must trip the 0.2 alert")
    // every other feature is constant on both halves → psi exactly 0
    Seq("len_chars", "n_tokens", "mean_word_len_x4", "source").foreach { f =>
      assert(out(f).getDouble(4) === 0.0, f)
      assert(!out(f).getBoolean(5), f)
    }
  }

  test("shard-merge invariance: the readout is identical under any input partitioning") {
    val docs = planted()
    val one = CorpusOps.driftPsiFrom(docs.repartition(1)).collect().map(_.toSeq)
    val many = CorpusOps.driftPsiFrom(docs.repartition(13)).collect().map(_.toSeq)
    assert(one.toSeq === many.toSeq)
    assert(one.length === 5)
  }

  test("an un-shifted corpus reads near-zero PSI and no alert at the gate SF") {
    val out = CorpusOps.driftPsi(spark, TestSpark.Sf).collect()
    assert(out.length === 5)
    out.foreach { r =>
      assert(r.getDouble(4) >= 0.0, r.getString(0))
      assert(r.getDouble(4) < 0.2, s"${r.getString(0)} drifted in iid synth data?")
      assert(!r.getBoolean(5), r.getString(0))
    }
  }
}
