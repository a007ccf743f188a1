package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** [[TextOps.bm25]] — the BM25 lexical scorer. The score is recomputed
  * in plain Scala from the raw documents (independent of every Spark
  * expression in the operator) and the top-k cut compared row for row;
  * the executed plan must rank through the mergeable bounded top-k
  * aggregate, never a partition-less rank window.
  */
class Bm25Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def brute(): Seq[(Long, Long, Double)] = {
    val docs = spark.read.parquet(s"${TestSpark.Sf}/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1).split(" ", -1).toSeq))
    val n = docs.length.toDouble
    val avgdl = docs.map(_._2.size).sum / n
    val q = TextOps.Bm25Query
    val df = q.map(t => t -> docs.count(_._2.contains(t))).toMap
    docs.flatMap { case (id, toks) =>
      val dl = toks.size
      val contribs = q.flatMap { t =>
        val tf = toks.count(_ == t)
        if (tf == 0 || df(t) == 0) None
        else {
          val idf = math.log(1.0 + (n - df(t) + 0.5) / (df(t) + 0.5))
          // parenthesized exactly as the Column expression associates,
          // then rounded to integer MICRO-units per term (the
          // operator's order-free long-sum discipline) — so the spec
          // pins the exact accumulation contract, not merely a value
          val c = idf * (tf * (TextOps.Bm25K1 + 1.0) /
            (tf + TextOps.Bm25K1 * ((1.0 - TextOps.Bm25B) +
              TextOps.Bm25B * dl / avgdl)))
          Some(BigDecimal(c * 1e6).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong)
        }
      }
      if (contribs.isEmpty) None
      else Some((id, dl.toLong,
        BigDecimal(contribs.sum / 1e6).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble))
    }.toSeq.sortBy(r => (-r._3, r._1)).take(TextOps.Bm25TopK)
  }

  test("top-20 matches an independent scalar recomputation") {
    val got = TextOps.bm25(spark, TestSpark.Sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    val want = brute().zipWithIndex
      .map { case ((id, dl, s), i) => (id, dl, s, (i + 1).toLong) }
    assert(got.toSeq === want)
  }

  test("ranks through the bounded top-k aggregate, no rank window") {
    val df = TextOps.bm25(spark, TestSpark.Sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("partial_bounded_top_k"), s"no partial top-k in:\n$plan")
    assert(!plan.contains("Window"), s"rank window survived in:\n$plan")
  }
}
