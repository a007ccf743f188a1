package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.plans.VectorExpressions

/** MMR diversification's contracts: the greedy recurrence (argmax
  * λ·rel − (1−λ)·max-sim-to-selected, maxsim clamped at 0, ties to
  * the smaller doc_id) must equal an independent driver replica on
  * the real fused lists; a PLANTED near-duplicate of the top result
  * must be demoted below a less-relevant but diverse candidate (the
  * de-dup property the operator exists for); candidates without
  * similarity edges and sub-k lists are handled; and the registered
  * output is internally consistent (first pick = pure-relevance
  * argmax, scores reproduce from the emitted columns).
  */
class MmrSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val Lam = HybridOps.MmrLambdaMicro
  private val Lam1 = 1000000L - Lam

  /** Driver replica of the greedy recurrence. */
  private def replica(cands: Seq[(Long, Long)],
      sims: Map[(Long, Long), Long]): Seq[(Long, Long, Long, Long)] = {
    def sim(a: Long, b: Long): Long =
      sims.getOrElse((a, b), sims.getOrElse((b, a), 0L))
    var sel = Vector.empty[(Long, Long, Long, Long)]
    var rem = cands
    while (rem.nonEmpty) {
      val scored = rem.map { case (id, rel) =>
        val ms = math.max(0L, if (sel.isEmpty) 0L else sel.map(s => sim(id, s._1)).max)
        (id, rel, ms, Lam * rel - Lam1 * ms)
      }
      val best = scored.minBy { case (id, _, _, sc) => (-sc, id) }
      sel :+= best
      rem = rem.filterNot(_._1 == best._1)
    }
    sel
  }

  /** Run the expression on planted lists. */
  private def run(cands: Seq[(Long, Long)],
      pairs: Seq[(Long, Long, Long)]): Seq[(Long, Long, Long, Long)] = {
    import spark.implicits._
    val df = Seq((cands, pairs)).toDF("cands", "pairs")
      .select(posexplode(VectorExpressions.mmrSelect(
        col("cands").cast("array<struct<doc_id:bigint,relm:bigint>>"),
        col("pairs").cast("array<struct<a:bigint,b:bigint,simm:bigint>>"),
        Lam)).as(Seq("p", "s")))
    df.orderBy("p").collect().map(r => (r.getStruct(1).getLong(0),
      r.getStruct(1).getLong(1), r.getStruct(1).getLong(2), r.getStruct(1).getLong(3))).toSeq
  }

  test("planted near-duplicate demotion: the top result's twin drops below a diverse doc") {
    // doc 1: rel .03; doc 2: near-identical twin (sim .99), rel .029 —
    // HIGHER relevance than doc 3 (rel .02, diverse). Pure relevance
    // ranks 1, 2, 3; MMR must rank 1, 3, 2.
    val cands = Seq((1L, 30000L), (2L, 29000L), (3L, 20000L))
    val pairs = Seq((1L, 2L, 990000L), (1L, 3L, 10000L), (2L, 3L, 20000L))
    val got = run(cands, pairs)
    assert(got.map(_._1) === Seq(1L, 3L, 2L),
      s"MMR should demote the near-duplicate: got ${got.map(_._1)}")
    assert(got === replica(cands, Map((1L, 2L) -> 990000L, (1L, 3L) -> 10000L,
      (2L, 3L) -> 20000L)))
    // the twin's recorded maxsim is its similarity to the selected top
    assert(got(2)._3 === 990000L)
  }

  test("ties break to the smaller doc_id; missing edges mean no penalty") {
    val cands = Seq((7L, 10000L), (5L, 10000L), (9L, 10000L))
    val got = run(cands, Nil) // no similarity edges at all
    assert(got.map(_._1) === Seq(5L, 7L, 9L))
    assert(got.forall(_._3 === 0L))
    // negative similarity exerts no penalty (clamp at 0)
    val got2 = run(Seq((1L, 20000L), (2L, 10000L)), Seq((1L, 2L, -500000L)))
    assert(got2.map(_._1) === Seq(1L, 2L) && got2(1)._3 === 0L)
  }

  test("the registered query matches a driver replica built from its own inputs") {
    val sf = TestSpark.Sf
    val out = HybridOps.hybridMmr(spark, sf).collect()
      .groupBy(_.getLong(0))
    // rebuild each probe's inputs from the emitted rows: rel from the
    // emitted rel_micro; sims re-derived from embeddings
    val e = graft.sources.Tables.embeddings(spark, sf)
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    // ONE half-up round to micro — the query/oracle contract (a
    // 6-decimal pre-round would double-round near half-micro edges)
    def cos6(a: Array[Double], b: Array[Double]): Long = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      BigDecimal(dot / (math.sqrt(na) * math.sqrt(nb)) * 1e6)
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    }
    out.foreach { case (_, rows) =>
      val cands = rows.map(r => (r.getLong(2), r.getLong(3))).toSeq
      val ids = cands.map(_._1)
      val sims = (for {
        a <- ids; b <- ids if a < b && e.contains(a) && e.contains(b)
      } yield (a, b) -> cos6(e(a), e(b))).toMap
      val exp = replica(cands, sims)
      val gotOrdered = rows.sortBy(_.getLong(1))
        .map(r => (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toSeq
      assert(gotOrdered === exp)
      // first pick is the pure-relevance argmax
      assert(gotOrdered.head._1 ===
        cands.minBy { case (id, rel) => (-rel, id) }._1)
    }
  }
}
