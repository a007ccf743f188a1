package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.ReusedExchangeExec
import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.functions.Geo
import graft.sources.Tables

/** The cell-blocked spatial join's contracts: exact equality with the
  * naive all-pairs join (the 3×3 neighbor cover loses no pair and the
  * single-cell point side invents no duplicate), and a plan with no
  * cartesian/BNLJ — the blocking IS the join key.
  */
class GeoCellJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def naive(dir: String) = {
    val s = Tables.supplier(spark, dir).select(col("s_suppkey"),
      Geo.synthLat(col("s_suppkey") + 7L).as("s_lat"),
      Geo.synthLon(col("s_suppkey") + 7L).as("s_lon"))
    val c = Tables.customer(spark, dir).select(col("c_custkey"),
      Geo.synthLat(col("c_custkey")).as("c_lat"),
      Geo.synthLon(col("c_custkey")).as("c_lon"))
    s.crossJoin(c)
      .withColumn("dist_km",
        round(Geo.haversineKm(col("s_lat"), col("s_lon"), col("c_lat"), col("c_lon")), 3))
      .filter(col("dist_km") <= GeoOps.CellRadiusKm)
      .select(col("s_suppkey"), col("c_custkey"), col("dist_km"))
  }

  private def asSet(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

  test("cell-blocked join equals the naive all-pairs join at two scales") {
    Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01").foreach { dir =>
      val blocked = asSet(GeoOps.geoCellJoin(spark, dir))
      val truth = asSet(naive(dir))
      assert(truth.nonEmpty, s"$dir: naive truth is empty — the test is vacuous")
      assert(blocked === truth, s"$dir: cell blocking diverged from the naive join")
    }
  }

  test("preflight pair_bound equals the actual pre-distance candidate count per cell") {
    val dir = "/root/testdata/sf0.01"
    // actual candidates: the same blocked join WITHOUT the distance
    // filter, grouped by the meeting cell (the customer's one cell)
    val cIx = GeoOps.CellIx
    val cIy = GeoOps.CellIy
    val c = Tables.customer(spark, dir).select(col("c_custkey"),
      expr(s"pmod(c_custkey * 40503, 1000) DIV $cIx").as("cx"),
      expr(s"pmod(c_custkey * 69427, 1000) DIV $cIy").as("cy"))
    val s = Tables.supplier(spark, dir).select(
      expr(s"pmod((s_suppkey + 7) * 40503, 1000) DIV $cIx").as("scx"),
      expr(s"pmod((s_suppkey + 7) * 69427, 1000) DIV $cIy").as("scy"))
      .select(explode(array((for (dx <- -1 to 1; dy <- -1 to 1) yield
        struct((col("scx") + dx).as("cx"), (col("scy") + dy).as("cy"))): _*)).as("n"))
      .select(col("n.cx").as("cx"), col("n.cy").as("cy"))
    val actual = s.join(c, Seq("cx", "cy"))
      .groupBy("cx", "cy").agg(count(lit(1)).as("n_cand"))
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    val bound = GeoOps.geoCellPreflight(spark, dir)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(4))).toMap
    assert(bound.nonEmpty)
    assert(bound === actual, "preflight bound must be EXACT, not an estimate")
  }

  test("budget dial: below-budget is exact; above-budget cuts exactly the hot-cell pairs") {
    val dir = "/root/testdata/sf0.01"
    val truth = asSet(naive(dir))
    // a budget above every cell's bound must change nothing
    val maxBound = GeoOps.geoCellPreflight(spark, dir)
      .agg(max(col("pair_bound"))).collect()(0).getLong(0)
    assert(asSet(GeoOps.geoCellJoinBudgeted(spark, dir, Some(maxBound))) === truth)
    // a budget below some cells' bound removes exactly the pairs whose
    // meeting cell (= the customer's one cell) is over budget
    val budget = maxBound / 2
    val hot = GeoOps.geoCellPreflight(spark, dir)
      .filter(col("pair_bound") > budget)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(hot.nonEmpty, "budget too high — the cut path is not exercised")
    val cellOf = Tables.customer(spark, dir).select(col("c_custkey"),
        expr(s"pmod(c_custkey * 40503, 1000) DIV ${GeoOps.CellIx}").as("cx"),
        expr(s"pmod(c_custkey * 69427, 1000) DIV ${GeoOps.CellIy}").as("cy"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val expected = truth.filterNot { case (_, ck, _) => hot(cellOf(ck)) }
    assert(expected.size < truth.size, "the cut must actually remove pairs")
    assert(asSet(GeoOps.geoCellJoinBudgeted(spark, dir, Some(budget))) === expected)
  }

  test("registered budgeted query: non-binding at sf0.01 (equals exact), binding at sf0.1 by bound") {
    val dir = "/root/testdata/sf0.01"
    // THE registered budget, not a copied literal — retuning
    // GeoCellBudget keeps this spec describing the shipped dial
    val budget = GeoOps.GeoCellBudget
    // the budget exceeds every sf0.01 cell bound, so the registered
    // degrade path must equal the registered exact join
    val maxBound = GeoOps.geoCellPreflight(spark, dir)
      .agg(max(col("pair_bound"))).collect()(0).getLong(0)
    assert(maxBound < budget, s"budget no longer non-binding at sf0.01 (max bound $maxBound)")
    assert(asSet(GeoOps.geoCellJoinBudgetedQ(spark, dir)) === asSet(GeoOps.geoCellJoin(spark, dir)))
    // at sf0.1 the PRE-JOIN bound already proves the cut is real —
    // cheap (two count aggs), no pair work at spec time
    val hot01 = GeoOps.geoCellPreflight(spark, "/root/testdata/sf0.1")
      .filter(col("pair_bound") > budget).count()
    assert(hot01 >= 1L, "budget must cut at least one sf0.1 cell")
  }

  test("the plan is a keyed join: no cartesian product, no nested-loop join") {
    def walk(p: SparkPlan): Seq[SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec => a +: walk(a.executedPlan)
      case q: QueryStageExec => q +: walk(q.plan)
      case r: ReusedExchangeExec => r +: walk(r.child)
      case other => other +: other.children.flatMap(walk)
    }
    val df = GeoOps.geoCellJoin(spark, "/root/testdata/sf0.001")
    df.collect()
    val nodes = walk(df.queryExecution.executedPlan)
    assert(!nodes.exists(_.isInstanceOf[CartesianProductExec]))
    assert(!nodes.exists(_.isInstanceOf[BroadcastNestedLoopJoinExec]))
  }
}
