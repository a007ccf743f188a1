package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** [[CdcOps.eventPaths]] — trigram path mining. Expected rows are
  * rebuilt in plain Scala from the collected events (sort per user,
  * sliding(3), count, rank), independent of every Spark expression;
  * the executed plan must cut through the bounded top-k aggregate
  * with no partition-less window.
  */
class EventPathsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("matches an independent scalar recomputation at sf0.001") {
    val events = graft.sources.Tables.events(spark, TestSpark.Sf)
      .selectExpr("user_id", "ts_ns", "event_id", "event_type")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val grams = events.groupBy(_._1).values.flatMap { rows =>
      rows.sortBy(r => (r._2, r._3)).map(_._4).sliding(3).filter(_.size == 3).map(_.toList)
    }
    val want = grams.toSeq.groupBy(identity).map { case (g, gs) => (g, gs.size.toLong) }
      .toSeq.sortBy { case (g, n) => (-n, g(0), g(1), g(2)) }
      .take(20).zipWithIndex
      .map { case ((g, n), i) => (g(0), g(1), g(2), n, (i + 1).toLong) }
    val got = CdcOps.eventPaths(spark, TestSpark.Sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2), r.getLong(3), r.getLong(4)))
      .toSeq
    assert(got.nonEmpty)
    assert(got === want)
  }

  test("cuts through the bounded top-k aggregate") {
    val df = CdcOps.eventPaths(spark, TestSpark.Sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("partial_bounded_top_k"), s"no partial top-k in:\n$plan")
  }
}
