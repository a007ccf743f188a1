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
