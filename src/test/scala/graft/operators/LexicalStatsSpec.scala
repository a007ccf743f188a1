package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Semantics of the lexical-statistics queries on controlled corpora:
  * exact TTR/hapax arithmetic, the analytic Zipf fit (a perfect
  * power-law corpus must regress to slope −1 with R² = 1), exact
  * char-entropy values on known distributions, and the zero-shuffle
  * plan contract of the entropy projection.
  */
class LexicalStatsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def docsDir(docs: Seq[(Long, String, String)]): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("lexstats").toString
    docs.toDF("doc_id", "text", "lang").write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    dir
  }

  test("ttr: exact counts and ratios on controlled docs") {
    val dir = docsDir(Seq(
      (1L, "a a a a", "en"),          // 4 tokens, 1 type, 0 hapax
      (2L, "w x y zz", "en")))        // 4 tokens, 4 types, 4 hapax
    val rows = TextOps.ttr(spark, dir).collect()
      .map(r => r.getLong(0) -> r).toMap
    val d1 = rows(1L)
    assert(d1.getLong(1) === 4L && d1.getLong(2) === 1L && d1.getLong(3) === 0L)
    assert(d1.getDouble(4) === 0.25)       // ttr
    assert(d1.getDouble(5) === 0.0)        // hapax_ratio
    assert(d1.getDouble(6) === 1.0)        // avg_token_len
    val d2 = rows(2L)
    assert(d2.getLong(1) === 4L && d2.getLong(2) === 4L && d2.getLong(3) === 4L)
    assert(d2.getDouble(4) === 1.0)
    assert(d2.getDouble(5) === 1.0)
    assert(d2.getDouble(6) === 1.25)       // (1+1+1+2)/4
  }

  test("zipf: a perfect power-law corpus regresses to slope -1 with R² = 1") {
    // counts 12, 6, 4, 3 at ranks 1..4: n·rank = 12 for every type →
    // ln n = ln 12 − 1·ln rank exactly
    val text = (Seq.fill(12)("w1") ++ Seq.fill(6)("w2") ++
      Seq.fill(4)("w3") ++ Seq.fill(3)("w4")).mkString(" ")
    val dir = docsDir(Seq((1L, text, "en")))
    val r = TextOps.zipfSlope(spark, dir).collect()
    assert(r.length === 1)
    assert(r(0).getString(0) === "en")
    assert(r(0).getLong(1) === 4L) // n_types
    assert(r(0).getLong(2) === 4L) // n_top
    assert(r(0).getDouble(3) === -1.0)
    assert(r(0).getDouble(4) === 1.0)
  }

  test("zipf rank cut: only the top-K types by (count desc, token) enter the fit") {
    // 1500 singleton types + 2 frequent ones; K = 1000 keeps the
    // frequent heads and the lexicographically-first singletons
    val text = (Seq.fill(10)("zz_head_a") ++ Seq.fill(5)("zz_head_b") ++
      (0 until 1500).map(i => f"t$i%04d")).mkString(" ")
    val dir = docsDir(Seq((1L, text, "en")))
    val r = TextOps.zipfSlope(spark, dir).collect()(0)
    assert(r.getLong(1) === 1502L) // full vocabulary counted
    assert(r.getLong(2) === 1000L) // fit bounded at K
  }

  test("char entropy: exact values on known distributions") {
    import graft.plans.TextExpressions._
    import org.apache.spark.unsafe.types.UTF8String
    assert(charEntropyCompute(UTF8String.fromString("aaaa")) === 0.0)
    assert(charEntropyCompute(UTF8String.fromString("ab")) === 1.0)
    assert(charEntropyCompute(UTF8String.fromString("abcd")) === 2.0)
    assert(charDistinctCompute(UTF8String.fromString("abcd")) === 4L)
    // code points, not UTF-16 chars: é is one code point...
    assert(charDistinctCompute(UTF8String.fromString("ééaa")) === 2L)
    assert(charEntropyCompute(UTF8String.fromString("ééaa")) === 1.0)
    // ...and so is an astral-plane emoji (2 UTF-16 chars)
    assert(charDistinctCompute(UTF8String.fromString("😀😀")) === 1L)
    assert(charEntropyCompute(UTF8String.fromString("😀😀")) === 0.0)
  }

  test("q_char_entropy through the query: values match and the plan has zero shuffles") {
    val dir = docsDir(Seq((1L, "ab", "en"), (2L, "aaaa", "en")))
    val df = TextOps.charEntropy(spark, dir)
    val byId = df.collect().map(r => r.getLong(0) -> r).toMap
    assert(byId(1L).getLong(1) === 2L && byId(1L).getDouble(3) === 1.0)
    assert(byId(2L).getLong(1) === 4L && byId(2L).getDouble(3) === 0.0)
    assert(shuffles(df) === 0, "per-row entropy must be a pure projection")
  }

  private def shuffles(df: DataFrame): Int = {
    def walk(p: SparkPlan): Seq[SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec => a +: walk(a.executedPlan)
      case q: QueryStageExec => q +: walk(q.plan)
      case other => other +: other.children.flatMap(walk)
    }
    df.collect() // finalize AQE
    walk(df.queryExecution.executedPlan).count(_.isInstanceOf[ShuffleExchangeLike])
  }
}
