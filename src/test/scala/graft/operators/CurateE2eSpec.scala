package graft.operators

import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.ReusedExchangeExec
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The composed curation pipeline: stage agreement with the
  * standalone registered operators, and the one-scan plan contract.
  */
class CurateE2eSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.01"

  private def walk(p: SparkPlan): Seq[SparkPlan] = p match {
    case a: AdaptiveSparkPlanExec => a +: walk(a.executedPlan)
    case q: QueryStageExec => q +: walk(q.plan)
    case r: ReusedExchangeExec => r +: walk(r.child)
    case other => other +: other.children.flatMap(walk)
  }

  test("e2e output agrees with every standalone stage operator") {
    val rows = CorpusOps.curateE2e(spark, sf).collect()
    assert(rows.nonEmpty, "the composed pipeline must keep documents")
    val reps = CorpusOps.dedupNormalized(spark, sf).collect()
      .map(_.getLong(0)).toSet
    val keep = TextOps.qualityLrScore(spark, sf).collect()
      .filter(_.getAs[Boolean]("pred_keep")).map(_.getAs[Long]("doc_id")).toSet
    val contam = CorpusOps.contamination(spark, sf).collect()
      .map(_.getLong(0)).toSet
    assert(contam.nonEmpty, "decontamination stage must have real work at this SF")
    rows.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      assert(reps(id), s"$id is not a dedup representative")
      assert(keep(id), s"$id fails the trained quality keep")
      assert(!contam(id), s"$id is contaminated and must be dropped")
      assert(r.getAs[Long]("src_rnk") >= 1L && r.getAs[Long]("src_rnk") <= 20L)
    }
    // packing invariant: within a language, cum_tokens is the running
    // sum in doc_id order and the shard derives from it
    rows.groupBy(_.getAs[String]("lang")).foreach { case (_, g) =>
      val sorted = g.sortBy(_.getAs[Long]("doc_id"))
      var cum = 0L
      sorted.foreach { r =>
        cum += r.getAs[Long]("est_tokens")
        assert(r.getAs[Long]("cum_tokens") === cum)
        assert(r.getAs[Long]("shard") ===
          (r.getAs[Long]("cum_tokens") - r.getAs[Long]("est_tokens")) / 2048L)
      }
    }
  }

  test("funnel telemetry: monotone attrition, stage-exact vs the composed output") {
    val f = CorpusOps.curateFunnel(spark, sf).collect().sortBy(_.getAs[Long]("stage_idx"))
    assert(f.map(_.getAs[String]("stage")).toSeq === Seq(
      "total", "after_dedup", "after_quality", "after_bench_drop",
      "after_decontam", "after_cap"))
    val ns = f.map(_.getAs[Long]("n_docs"))
    ns.zip(ns.tail).foreach { case (a, b) => assert(a >= b, ns.mkString(",")) }
    // the funnel's mouth is the corpus, its throat is EXACTLY the
    // composed pipeline's output
    assert(ns.head === graft.sources.Tables.documents(spark, sf).count())
    assert(ns.last === CorpusOps.curateE2e(spark, sf).count())
    assert(f.head.getAs[Double]("kept_frac") === 1.0)
  }

  test("the composed plan scans the document table exactly once") {
    // the trained weights are literals and the contaminated-id set is
    // a pre-materialized bounded artifact, so the registered query's
    // OWN plan must read documents.parquet once — stages compose as
    // windows/filters/joins over that single scan, never a re-read
    val df = CorpusOps.curateE2e(spark, sf)
    df.collect()
    val docScans = walk(df.queryExecution.executedPlan).count {
      case f: FileSourceScanExec =>
        f.relation.location.rootPaths.exists(_.toString.contains("documents"))
      case _ => false
    }
    assert(docScans === 1, s"expected exactly 1 documents scan, got $docScans")
  }
}
