package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.ReusedExchangeExec
import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, CartesianProductExec}
import org.scalatest.funsuite.AnyFunSuite

/** Plan-shape regression guards: the properties `.explain` reviews
  * manually, pinned in CI. A pass that silently loses column pruning,
  * turns a broadcast dim join into a shuffle, or plans a cartesian
  * product is a 100 TB incident a correctness hash can't catch.
  */
class PlanGuardsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.Sf

  private def nodes(df: DataFrame): Seq[SparkPlan] = {
    def walk(p: SparkPlan): Seq[SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec => a +: walk(a.executedPlan)
      case q: QueryStageExec => q +: walk(q.plan)
      case r: ReusedExchangeExec => r +: walk(r.child)
      case other => other +: other.children.flatMap(walk)
    }
    walk(df.queryExecution.executedPlan)
  }

  test("q1_agg scan is column-pruned to the referenced lineitem columns") {
    val scans = nodes(Queries.q1Agg(spark, sf)).collect {
      case s: FileSourceScanExec => s
    }
    assert(scans.nonEmpty)
    val widths = scans.map(_.requiredSchema.fieldNames.length)
    // 7 referenced columns (flag, status, qty, price, discount, tax,
    // shipdate) out of 16 — a 16-wide read schema means pruning died
    assert(widths.forall(_ <= 7),
      s"lineitem read schema widths $widths exceed the 7 referenced columns")
  }

  test("q1_agg pushes the shipdate filter into the parquet scan") {
    val scans = nodes(Queries.q1Agg(spark, sf)).collect {
      case s: FileSourceScanExec => s
    }
    assert(scans.exists(_.metadata.get("PushedFilters").exists(_.contains("LessThanOrEqual"))),
      "shipdate predicate not pushed to the scan")
  }

  test("star join plans every dimension as a broadcast join, no cartesian product") {
    val df = graft.operators.CoreOps.joinAggNation(spark, sf)
    df.write.format("noop").mode("overwrite").save() // let AQE finalize
    val ns = nodes(df)
    assert(!ns.exists(_.isInstanceOf[CartesianProductExec]), "cartesian product planned")
    val broadcasts = ns.count(_.isInstanceOf[BroadcastHashJoinExec])
    assert(broadcasts >= 2, s"expected ≥2 broadcast dim joins, saw $broadcasts")
  }

  test("heavy pair pipelines plan no cartesian product") {
    for (q <- Seq("q_token_jaccard_join", "q_dedup_ngram", "q_dedup_minhash")) {
      val ns = nodes(SparkEntry.queries(q)(spark, sf))
      assert(!ns.exists(_.isInstanceOf[CartesianProductExec]),
        s"$q plans a cartesian product")
    }
  }
}
