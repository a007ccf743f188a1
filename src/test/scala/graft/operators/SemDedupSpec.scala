package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.sources.Tables

/** [[DedupOps.semDedup]] — cluster-then-pair semantic dedup. The
  * expected output is rebuilt through a DIFFERENT plan (rank-window
  * assignment + unrestricted all-pairs join filtered to co-celled
  * pairs) over the same scoring expressions, so the aggregate-based
  * production shapes (min-struct argmax, dominance-ordered cell join,
  * per-removed min-struct keeper) are each checked against the naive
  * form they replaced. Plan guards pin the broadcast assignment and
  * the absence of any cartesian/BNLJ.
  */
class SemDedupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** Naive twin: same cells / ccos / cos expressions, window + BNLJ
    * shapes, keep-priority resolved by a row_number window.
    */
  private def naive(dir: String): DataFrame = {
    import graft.plans.VectorExpressions
    val cells = DedupOps.semCells(Tables.rowCount(spark, dir, "embeddings"))
    val e = Tables.embeddings(spark, dir).select(col("vec_id"), col("embedding"))
      .withColumn("nrm", VectorExpressions.normNative(col("embedding")))
    val cents = e.filter(col("vec_id") < cells)
      .select(col("vec_id").as("cell"), col("embedding").as("c_emb"), col("nrm").as("c_nrm"))
    val asg = e.crossJoin(broadcast(cents))
      .withColumn("ccos", round(VectorExpressions.cosineNative(
        col("c_emb"), col("c_nrm"), col("embedding"), col("nrm")), 6))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("vec_id")).orderBy(col("ccos").desc, col("cell"))))
      .filter(col("rn") === 1)
      .select(col("vec_id"), col("cell"), col("ccos"), col("embedding"), col("nrm"))
    val pairs = asg.as("a").join(asg.as("b"),
        col("a.cell") === col("b.cell") && col("a.vec_id") =!= col("b.vec_id") &&
          struct(col("a.ccos"), col("a.vec_id")) < struct(col("b.ccos"), col("b.vec_id")))
      .withColumn("cos", round(VectorExpressions.cosineNative(
        col("a.embedding"), col("a.nrm"), col("b.embedding"), col("b.nrm")), 6))
      .filter(col("cos") >= DedupOps.SemCosThreshold)
    pairs
      .withColumn("krn", row_number().over(
        Window.partitionBy(col("b.vec_id")).orderBy(col("a.ccos"), col("a.vec_id"))))
      .filter(col("krn") === 1)
      .select(col("b.vec_id").as("removed"), col("a.cell").as("cell"),
        col("a.vec_id").as("kept_by"), col("cos"))
  }

  test("matches the window/all-pairs naive twin at sf0.001") {
    val got = DedupOps.semDedup(spark, TestSpark.Sf)
      .collect().map(_.toSeq).toSet
    val want = naive(TestSpark.Sf).collect().map(_.toSeq).toSet
    assert(got.nonEmpty, "semDedup emitted no rows on testdata")
    assert(got === want)
  }

  test("a removed vector's keeper has strictly lower keep-priority") {
    val rows = DedupOps.semDedup(spark, TestSpark.Sf).collect()
    val byId = rows.map(r => r.getLong(0) -> r.getLong(2)).toMap
    // kept_by is a DIFFERENT vector, and the relation is irreflexive
    rows.foreach { r =>
      assert(r.getLong(0) !== r.getLong(2))
      assert(r.getDouble(3) >= DedupOps.SemCosThreshold)
    }
    // priority is a strict order on (ccos, id), so no 2-cycles
    byId.foreach { case (rm, kb) =>
      assert(!byId.get(kb).contains(rm), s"keep cycle between $rm and $kb")
    }
  }

  test("kmeans variant: invariants hold and the trained layout finds its own pairs") {
    val rows = DedupOps.semDedupKmeans(spark, TestSpark.Sf).collect()
    assert(rows.nonEmpty, "semDedupKmeans emitted no rows on testdata")
    rows.foreach { r =>
      assert(r.getLong(0) !== r.getLong(2)) // removed != kept_by
      assert(r.getDouble(3) >= DedupOps.SemCosThreshold)
    }
    // pairs are cell-CONDITIONAL: the trained layout groups differently
    // than lowest-id anchors, so the two removal sets need not match —
    // but both verify with the SAME exact cosine, so any (removed,
    // kept_by) pair common to both must agree on the cosine
    val det = DedupOps.semDedup(spark, TestSpark.Sf).collect()
      .map(r => (r.getLong(0), r.getLong(2)) -> r.getDouble(3)).toMap
    rows.foreach { r =>
      det.get((r.getLong(0), r.getLong(2))).foreach { c =>
        assert(c === r.getDouble(3), s"cosine drift on pair ${r.getLong(0)}/${r.getLong(2)}")
      }
    }
  }

  test("assignment broadcasts the anchors; no cartesian in the executed plan") {
    val df = DedupOps.semDedup(spark, TestSpark.Sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastExchange"),
      s"anchor broadcast missing in:\n$plan")
    assert(!plan.contains("CartesianProduct"), s"cartesian product in:\n$plan")
  }
}
