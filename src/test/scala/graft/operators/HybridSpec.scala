package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Guards for the hybrid lexical+vector RRF fusion. */
class HybridSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.01"

  test("RRF fusion equals a driver-side replica of 1/(60+rank) over the two arms") {
    val lex = TextOps.bm25(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("rnk")).toMap
    val vec = AnnOps.exactCosineTopK(spark, sf, HybridOps.VecArmK).collect()
      .map(r => (r.getAs[Long]("probe_id"), r.getAs[Long]("vec_id")) -> r.getAs[Long]("rnk"))
      .toMap
    def r6(v: Double) =
      BigDecimal.valueOf(v).setScale(6, scala.math.BigDecimal.RoundingMode.HALF_UP).toDouble
    // replica: per probe, fuse over the union of arm candidates
    val expected = (0L until AnnOps.NProbes.toLong).flatMap { p =>
      val cands = (lex.keySet.filter(_ != p) ++
        vec.keySet.collect { case (`p`, d) => d }).toSeq
      cands.map { d =>
        val s = lex.get(d).filter(_ => d != p).map(r => 1.0 / (HybridOps.RrfK + r)).getOrElse(0.0) +
          vec.get((p, d)).map(r => 1.0 / (HybridOps.RrfK + r)).getOrElse(0.0)
        (p, d, r6(s))
      }.sortBy { case (_, d, s) => (-s, d) }
        .take(HybridOps.HybridTopK).zipWithIndex
        .map { case ((pp, d, s), i) => (pp, d, s, i + 1L) }
    }.toSet
    val got = HybridOps.hybridRank(spark, sf).collect()
      .map(r => (r.getAs[Long]("probe_id"), r.getAs[Long]("doc_id"),
        r.getAs[Double]("rrf"), r.getAs[Long]("rnk"))).toSet
    assert(got === expected)
  }

  test("IVF-armed hybrid: same fusion, arm swap only — shares the lexical arm and fuses IVF ranks") {
    val exact = HybridOps.hybridRank(spark, sf).collect()
      .map(r => (r.getAs[Long]("probe_id"), r.getAs[Long]("doc_id"))).toSet
    val ivf = HybridOps.hybridRankIvf(spark, sf).collect()
    assert(ivf.groupBy(_.getAs[Long]("probe_id")).size === 10)
    // the IVF arm prunes (nprobe/cells of the corpus), so the fused
    // set may differ — but the LEXICAL contributions are shared, so
    // overlap with the exact-armed fusion must stay substantial
    val ivfSet = ivf.map(r => (r.getAs[Long]("probe_id"), r.getAs[Long]("doc_id"))).toSet
    val overlap = ivfSet.intersect(exact).size.toDouble / exact.size
    assert(overlap > 0.5, s"ivf-armed fusion diverged too far: $overlap")
    // a doc ranked by BOTH arms must carry both rank columns
    ivf.filter(r => !r.isNullAt(r.fieldIndex("lex_rnk")) && !r.isNullAt(r.fieldIndex("vec_rnk")))
      .foreach { r =>
        val expected = BigDecimal.valueOf(
          1.0 / (60 + r.getAs[Long]("lex_rnk")) + 1.0 / (60 + r.getAs[Long]("vec_rnk")))
          .setScale(6, scala.math.BigDecimal.RoundingMode.HALF_UP).toDouble
        assert(r.getAs[Double]("rrf") === expected)
      }
  }

  test("per-probe fusion equals a driver-side replica (tf-idf terms → per-probe bm25 → rrf)") {
    import spark.implicits._
    def r6(v: Double) =
      BigDecimal.valueOf(v).setScale(6, scala.math.BigDecimal.RoundingMode.HALF_UP).toDouble
    val docs = graft.sources.Tables.documents(spark, sf)
      .select($"doc_id", $"text").as[(Long, String)].collect().toSeq
    val toks = docs.map { case (id, t) => id -> t.split(" ", -1).toSeq }.toMap
    val n = docs.size.toDouble
    val dl = toks.map { case (id, ts) => id -> ts.size.toDouble }
    val avgdl = dl.values.sum / n
    // per-probe top-4 tf-idf terms over the probe-vocabulary df
    val probeIds = docs.map(_._1).filter(_ < AnnOps.NProbes.toLong)
    val pvocab = probeIds.flatMap(toks(_)).toSet
    val df = pvocab.map(t => t -> docs.count(d => toks(d._1).contains(t)).toDouble).toMap
    val pterms = probeIds.map { p =>
      val tf = toks(p).groupBy(identity).map { case (t, xs) => t -> xs.size }
      p -> tf.toSeq.map { case (t, f) => (t, r6(f * math.log(n / df(t)))) }
        .sortBy { case (t, s) => (-s, t) }.take(HybridOps.PpTerms).map(_._1)
    }.toMap
    // per-probe bm25 (integer micro-unit contributions)
    def bm25(p: Long, d: Long): Option[Double] = {
      val micro = pterms(p).flatMap { t =>
        val tf = toks(d).count(_ == t)
        if (tf == 0) None
        else {
          val idf = math.log(1.0 + (n - df(t) + 0.5) / (df(t) + 0.5))
          Some(math.round(idf * (tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dl(d) / avgdl))) * 1e6))
        }
      }.sum
      if (micro == 0L) None else Some(r6(micro / 1e6))
    }
    val lexPp = probeIds.flatMap { p =>
      docs.map(_._1).filter(_ != p).flatMap(d => bm25(p, d).map(s => (d, s)))
        .sortBy { case (d, s) => (-s, d) }.take(TextOps.Bm25TopK).zipWithIndex
        .map { case ((d, _), i) => (p, d) -> (i + 1L) }
    }.toMap
    val vec = AnnOps.exactCosineTopK(spark, sf, HybridOps.VecArmK).collect()
      .map(r => (r.getAs[Long]("probe_id"), r.getAs[Long]("vec_id")) -> r.getAs[Long]("rnk"))
      .toMap
    val expected = probeIds.sorted.flatMap { p =>
      val cands = (lexPp.keySet.collect { case (`p`, d) => d } ++
        vec.keySet.collect { case (`p`, d) => d }).toSeq
      cands.map { d =>
        val s = lexPp.get((p, d)).map(r => 1.0 / (HybridOps.RrfK + r)).getOrElse(0.0) +
          vec.get((p, d)).map(r => 1.0 / (HybridOps.RrfK + r)).getOrElse(0.0)
        (p, d, r6(s))
      }.sortBy { case (_, d, s) => (-s, d) }
        .take(HybridOps.HybridTopK).zipWithIndex
        .map { case ((pp, d, s), i) => (pp, d, s, i + 1L) }
    }.toSet
    val got = HybridOps.hybridRankPp(spark, sf).collect()
      .map(r => (r.getAs[Long]("probe_id"), r.getAs[Long]("doc_id"),
        r.getAs[Double]("rrf"), r.getAs[Long]("rnk"))).toSet
    assert(got === expected)
  }

  test("per-probe lexical arm surfaces a probe-specific doc the shared fixed query cannot") {
    import spark.implicits._
    // probe 0's document is dominated by a rare term; doc 500 shares
    // it. The shared Bm25Query terms (hash/join/vector/stream) appear
    // only in OTHER docs — so the shared lexical arm can never rank
    // 500, while the per-probe arm must put it at lex_rnk 1
    val docs = (
      Seq((0L, "zyzzyva amble zyzzyva quorum"),
          (500L, "zyzzyva canter bramble")) ++
      (1L to 40L).map(i => (i, s"hash join vector stream filler$i pad words here"))
    ).toDF("doc_id", "text")
    val arm = HybridOps.ppLexArmFrom(docs).collect()
      .map(r => (r.getAs[Long]("probe_id"), r.getAs[Long]("doc_id"), r.getAs[Long]("lex_rnk")))
    val p0 = arm.filter(_._1 == 0L)
    assert(p0.exists(x => x._2 == 500L),
      "per-probe arm missed the probe-specific relevant doc")
    // 500 shares probe 0's rarest (highest-tfidf) term → top lexical hit
    assert(p0.find(_._2 == 500L).get._3 === 1L)
    // the shared fixed-term arm cannot contain it (no query term in 500)
    assert(!"zyzzyva canter bramble".split(" ").exists(TextOps.Bm25Query.contains),
      "planted doc accidentally contains a shared query term")
  }

  test("IVF-armed per-probe hybrid: lexical contributions shared with the exact-armed pp fusion") {
    val exact = HybridOps.hybridRankPp(spark, sf).collect()
      .map(r => (r.getAs[Long]("probe_id"), r.getAs[Long]("doc_id"))).toSet
    val ivf = HybridOps.hybridRankPpIvf(spark, sf).collect()
    val ivfSet = ivf.map(r => (r.getAs[Long]("probe_id"), r.getAs[Long]("doc_id"))).toSet
    // the IVF arm prunes, but the per-probe LEXICAL arm is shared —
    // the fused sets must overlap substantially (the q_hybrid_rank_ivf
    // discipline applied to the pp pair)
    val overlap = ivfSet.intersect(exact).size.toDouble / exact.size
    assert(overlap > 0.5, s"ivf-armed pp fusion diverged too far: $overlap")
    // per-row RRF arithmetic holds on both-arm rows
    ivf.filter(r => !r.isNullAt(r.fieldIndex("lex_rnk")) && !r.isNullAt(r.fieldIndex("vec_rnk")))
      .foreach { r =>
        val expected = BigDecimal.valueOf(
          1.0 / (60 + r.getAs[Long]("lex_rnk")) + 1.0 / (60 + r.getAs[Long]("vec_rnk")))
          .setScale(6, scala.math.BigDecimal.RoundingMode.HALF_UP).toDouble
        assert(r.getAs[Double]("rrf") === expected)
      }
  }

  test("fusion beats each single arm on a planted mid-ranked-everywhere relevant doc") {
    import spark.implicits._
    // doc 100 is rank 3 in BOTH arms; docs 1/2 top their single arm
    // but are absent from the other — RRF must put 100 first:
    // 2/(60+3) = 0.031746 > 1/(60+1) = 0.016393
    val lex = Seq((0L, 1L, 1L), (0L, 10L, 2L), (0L, 100L, 3L))
      .toDF("probe_id", "doc_id", "lex_rnk")
    val vec = Seq((0L, 2L, 1L), (0L, 20L, 2L), (0L, 100L, 3L))
      .toDF("probe_id", "doc_id", "vec_rnk")
    val fused = HybridOps.rrfFuse(lex, vec).collect().sortBy(_.getAs[Long]("rnk"))
    assert(fused.head.getAs[Long]("doc_id") === 100L,
      "the doc relevant to BOTH arms must outrank every single-arm winner")
    assert(fused.head.getAs[Double]("rrf") === 0.031746)
    // single arms rank the planted doc only 3rd
    assert(fused.filter(_.getAs[Long]("doc_id") == 100L).head.getAs[Long]("rnk") === 1L)
  }
}
