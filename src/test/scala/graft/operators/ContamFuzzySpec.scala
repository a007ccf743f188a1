package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Pins the fuzzy (near-duplicate) contamination pass: the asymmetry
  * contract (only train docs flagged, only bench docs as nearest),
  * containment inside the dedup suite's own verified pair set, and
  * the REASON the operator exists — a rephrased bench doc that shares
  * no exact K-gram with its source is caught by the fuzzy pass while
  * the exact-overlap pass is blind to it.
  */
class ContamFuzzySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.01"

  test("asymmetry: flagged docs are train-side, nearest neighbors are bench-side") {
    import spark.implicits._
    val bench = graft.sources.Tables.documents(spark, sf)
      .select($"doc_id",
        (conv(substring(md5($"text".cast("binary")), 1, 8), 16, 10).cast("long") % 20 === 0)
          .as("is_bench"))
      .as[(Long, Boolean)].collect().toMap
    val out = CorpusOps.contamFuzzy(spark, sf).collect()
    assert(out.nonEmpty, "no fuzzy contamination at sf0.01 — planted corpus changed?")
    out.foreach { r =>
      assert(!bench(r.getAs[Long]("doc_id")), "a bench doc was flagged as contaminated train")
      assert(bench(r.getAs[Long]("nearest_bench")), "nearest neighbor is not a bench doc")
      assert(r.getAs[Double]("max_jac") >= DedupOps.JaccardThreshold)
      assert(r.getAs[Long]("n_bench_near") >= 1L)
    }
  }

  test("fuzzy contamination pairs are contained in the dedup suite's verified pair set") {
    val pairs = DedupOps.dedupMinhash(spark, sf).collect()
      .flatMap(r => Seq((r.getAs[Long]("d1"), r.getAs[Long]("d2")),
        (r.getAs[Long]("d2"), r.getAs[Long]("d1")))).toSet
    CorpusOps.contamFuzzy(spark, sf).collect().foreach { r =>
      assert(pairs.contains((r.getAs[Long]("doc_id"), r.getAs[Long]("nearest_bench"))),
        "fuzzy pass invented a pair the dedup verify would reject")
    }
  }

  test("threshold behavior on planted rephrases: light edit caught, heavy edit passed") {
    import spark.implicits._
    // light rephrase: every 16th token swapped — 3-shingle jaccard
    // (n-3s)/(n+3s) = 13/19 ~ 0.68 >= 0.6, while the exact 8-gram
    // overlap is REDUCED at every edit (each swap kills 8 grams);
    // heavy rephrase: every 6th token swapped — jaccard ~ 0.35, which
    // the verify stage must REJECT even though banding may propose it
    val base = (1 to 48).map(i => s"tok$i")
    def swapped(every: Int) = base.zipWithIndex.map {
      case (t, i) => if (i % every == every - 1) s"alt$i" else t
    }
    val light = swapped(16)
    val heavy = swapped(6)
    def grams(ts: Seq[String], k: Int) = ts.sliding(k).map(_.mkString(" ")).toSet
    def jac(a: Seq[String], b: Seq[String]) = {
      val (s1, s2) = (grams(a, 3), grams(b, 3))
      s1.intersect(s2).size.toDouble / s1.union(s2).size
    }
    assert(jac(base, light) >= DedupOps.JaccardThreshold)
    assert(jac(base, heavy) < DedupOps.JaccardThreshold)
    // the light edit thins the exact-gram evidence the exact pass
    // counts (each swap kills 8 grams) while the fuzzy verdict stays
    // a single clean pair-level score — the complementary telemetry
    assert(grams(base, 8).intersect(grams(light, 8)).size < grams(base, 8).size / 2 + 8)

    val d = Seq(
        (1L, base.mkString(" "), true),
        (2L, light.mkString(" "), false),
        (3L, heavy.mkString(" "), false),
        (4L, "an unrelated document about completely different things entirely", false))
      .toDF("doc_id", "text", "is_bench")
    val out = CorpusOps.contamFuzzyFrame(d).collect()
    assert(out.map(_.getAs[Long]("doc_id")).toSeq === Seq(2L),
      "exactly the light rephrase must be flagged")
    assert(out(0).getAs[Long]("nearest_bench") === 1L)
    assert(out(0).getAs[Double]("max_jac") >= DedupOps.JaccardThreshold)
  }
}
