package graft

import org.scalatest.funsuite.AnyFunSuite

/** Every SparkEntry query runs at sf0.001 and yields a sane result.
  * (Value-level correctness is enforced by the DuckDB oracle gate;
  * these specs guard against regressions that break plans outright.)
  */
class QueriesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** Queries whose legitimate result can be empty at tiny scale. */
  private val mayBeEmpty = Set("q_dedup_embedding", "q_dedup_ngram", "q_dedup_minhash",
    "q_dedup_simhash", "q_levenshtein_pairs")

  SparkEntry.queries.foreach { case (name, fn) =>
    test(s"$name runs at sf0.001") {
      val df = fn(spark, TestSpark.Sf)
      val n = df.count()
      assert(n >= 0)
      if (!mayBeEmpty(name)) assert(n > 0, s"$name returned no rows")
      assert(df.columns.nonEmpty)
    }
  }

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key has a query") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle entries without queries: $missing")
  }

  test("every query has an oracle: nothing silently degrades to the rows-only check") {
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(missing.isEmpty, s"queries without oracle SQL: $missing")
  }
}
