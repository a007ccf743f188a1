package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** [[TextOps.pmiPairs]] — NPMI collocation mining. Expected rows are
  * recomputed in plain Scala from the raw documents (independent of
  * every Spark expression), including the deterministic top-df vocab
  * cut and the min-co-docs filter.
  */
class PmiPairsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def r6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("matches an independent scalar recomputation at sf0.001") {
    val docs = spark.read.parquet(s"${TestSpark.Sf}/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1).split(" ", -1).toSet))
    val n = docs.length
    val df = docs.flatMap(_._2).groupBy(identity).map { case (t, ts) => t -> ts.length }
    val vocab = df.toSeq.sortBy { case (t, d) => (-d, t) }.take(TextOps.PmiVocab).toMap
    val pairCount = scala.collection.mutable.Map.empty[(String, String), Int]
    docs.foreach { case (_, toks) =>
      val hit = toks.filter(vocab.contains).toSeq.sorted
      for (i <- hit.indices; j <- (i + 1) until hit.size)
        pairCount((hit(i), hit(j))) = pairCount.getOrElse((hit(i), hit(j)), 0) + 1
    }
    val want = pairCount.collect {
      case ((t1, t2), both) if both >= TextOps.PmiMinPairDocs =>
        val pab = both / n.toDouble
        val npmi =
          if (both == n) 1.0
          else math.log(pab / ((vocab(t1) / n.toDouble) * (vocab(t2) / n.toDouble))) /
            -math.log(pab)
        (t1, t2, both.toLong, vocab(t1).toLong, vocab(t2).toLong, r6(npmi))
    }.toSet
    val got = TextOps.pmiPairs(spark, TestSpark.Sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5))).toSet
    assert(got.nonEmpty)
    assert(got === want)
  }

  test("vocabulary and stats broadcast; pair fan bounded by the vocab cap") {
    val df = TextOps.pmiPairs(spark, TestSpark.Sf)
    val rows = df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastExchange"), s"vocab broadcast missing in:\n$plan")
    val terms = rows.flatMap(r => Seq(r.getString(0), r.getString(1))).distinct
    assert(terms.length <= TextOps.PmiVocab)
    assert(rows.length <= TextOps.PmiVocab * (TextOps.PmiVocab - 1) / 2)
  }
}
