package graft.plans

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** [[TopKAgg]] replaced the per-probe `row_number` windows in the
  * kNN/ANN family claiming bit-equality with the window form. These
  * tests pin that claim: for data with ties, sparse groups (< k rows),
  * ±0.0 doubles and string payloads, the aggregate + posexplode must
  * reproduce `row_number().over(partitionBy(g).orderBy(...))` exactly —
  * across a real multi-partition shuffle, so the partial-update,
  * serialize/deserialize and merge paths all execute.
  */
class TopKAggSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  // deterministic corpus: 5 groups × 200 rows, many score ties (v has
  // only 17 distinct values per group), ids unique per group so the
  // window order is total
  private def corpus() = {
    import spark.implicits._
    val rows = for {
      g <- 0 until 5
      i <- 0 until 200
    } yield (g.toLong, ((i * 31 + g * 7) % 17).toDouble / 4.0 - 2.0, i.toLong)
    rows.toDF("g", "v", "id").repartition(13)
  }

  test("ascending topK + posexplode == row_number window, across a shuffle") {
    val df = corpus()
    val k = 7
    val w = Window.partitionBy(col("g")).orderBy(col("v"), col("id"))
    val want = df.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("g"), col("id"), col("v"), col("rnk").cast("long").as("rnk"))
      .collect().map(_.toSeq).toSet
    val got = df.groupBy(col("g"))
      .agg(TopKAgg.topK(struct(col("v"), col("id")), k).as("tk"))
      .select(col("g"), posexplode(col("tk")).as(Seq("pos", "it")))
      .select(col("g"), col("it.id").as("id"), col("it.v").as("v"),
        (col("pos") + 1).cast("long").as("rnk"))
      .collect().map(_.toSeq).toSet
    assert(got === want)
  }

  test("negated-descending topK matches a desc window, including ±0.0") {
    import spark.implicits._
    // explicit ±0.0 collisions: the probeTopKDesc contract claims
    // Double.compare semantics agree under negation
    val rows = Seq(
      (0L, 0.0, 1L), (0L, -0.0, 2L), (0L, 0.5, 3L), (0L, -0.5, 4L),
      (0L, 0.0, 5L), (1L, -0.0, 1L), (1L, -0.0, 2L), (1L, 1.0, 3L))
    val df = rows.toDF("g", "v", "id").repartition(3)
    val k = 4
    val w = Window.partitionBy(col("g")).orderBy(col("v").desc, col("id"))
    val want = df.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("g"), col("id"), col("v"), col("rnk").cast("long").as("rnk"))
      .collect().map(_.toSeq).toSet
    val got = df.groupBy(col("g"))
      .agg(TopKAgg.topK(struct(negate(col("v")).as("nv"), col("id").as("id"),
        col("v").as("v")), k).as("tk"))
      .select(col("g"), posexplode(col("tk")).as(Seq("pos", "it")))
      .select(col("g"), col("it.id").as("id"), col("it.v").as("v"),
        (col("pos") + 1).cast("long").as("rnk"))
      .collect().map(_.toSeq).toSet
    assert(got === want)
  }

  test("groups smaller than k emit all their rows, ranked") {
    import spark.implicits._
    val df = Seq((0L, 3.0, 1L), (0L, 1.0, 2L), (1L, 9.0, 9L))
      .toDF("g", "v", "id").repartition(4)
    val got = df.groupBy(col("g"))
      .agg(TopKAgg.topK(struct(col("v"), col("id")), 5).as("tk"))
      .select(col("g"), posexplode(col("tk")).as(Seq("pos", "it")))
      .select(col("g"), col("it.id"), (col("pos") + 1).as("rnk"))
      .collect().map(_.toSeq).toSet
    assert(got === Set(Seq(0L, 2L, 1), Seq(0L, 1L, 2), Seq(1L, 9L, 1)))
  }

  test("string payloads survive buffer copies and serialization") {
    import spark.implicits._
    // strings exercise the UnsafeProjection copy in update(): a
    // retained reference into a reused row buffer would corrupt these
    val rows = (0 until 300).map(i => (i % 3, i.toDouble, s"payload-$i-${"x" * (i % 11)}"))
    val df = rows.toDF("g", "v", "s").repartition(9)
    val w = Window.partitionBy(col("g")).orderBy(col("v"), col("s"))
    val want = df.withColumn("rnk", row_number().over(w)).filter(col("rnk") <= 6)
      .select(col("g"), col("v"), col("s")).collect().map(_.toSeq).toSet
    val got = df.groupBy(col("g"))
      .agg(TopKAgg.topK(struct(col("v"), col("s")), 6).as("tk"))
      .select(col("g"), explode(col("tk")).as("it"))
      .select(col("g"), col("it.v").as("v"), col("it.s").as("s"))
      .collect().map(_.toSeq).toSet
    assert(got === want)
  }

  test("executed kNN/ANN plans use partial ObjectHashAggregate, not a per-probe window") {
    for (q <- Seq("q_geo_knn", "q_ann_topk", "q_group_topn")) {
      val df = graft.SparkEntry.queries(q)(spark, TestSpark.Sf)
      df.collect() // executed plan, post-AQE
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("WindowExec") && !plan.contains("Window "),
        s"$q still carries a window:\n$plan")
      assert(plan.contains("ObjectHashAggregate"),
        s"$q lost the ObjectHashAggregate top-k:\n$plan")
      assert(plan.contains("partial_bounded_top_k"),
        s"$q is not map-side combining the top-k:\n$plan")
    }
  }
}
