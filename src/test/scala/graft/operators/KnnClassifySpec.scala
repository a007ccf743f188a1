package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.sources.Tables

/** [[AnnOps.knnClassify]] and [[AnnOps.clusterPurity]] — the labeled
  * diagnostics of the ANN family. Expected rows are rebuilt through
  * rank windows over builtin-fold cosines (different expression trees
  * AND different rank shapes from the production aggregates).
  */
class KnnClassifySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def foldCos(a: Column, b: Column): Column = {
    def nrm(c: Column) =
      sqrt(aggregate(c, lit(0.0), (acc, v) => acc + v.cast("double") * v.cast("double")))
    round(aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v) / (nrm(a) * nrm(b)), 6)
  }

  private def e(): DataFrame =
    Tables.embeddings(spark, TestSpark.Sf).select(col("vec_id"), col("embedding"), col("label"))

  test("knn prediction matches a window-ranked builtin-fold twin") {
    val corpus = e()
    val probes = corpus.filter(col("vec_id") < 10)
      .select(col("vec_id").as("probe_id"), col("embedding").as("p_emb"),
        col("label").as("true_label"))
    val nn = corpus.crossJoin(probes)
      .filter(col("vec_id") =!= col("probe_id"))
      .withColumn("cos", foldCos(col("p_emb"), col("embedding")))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("probe_id")).orderBy(col("cos").desc, col("vec_id"))))
      .filter(col("rn") <= 5)
    val want = nn.groupBy("probe_id", "label").agg(count(lit(1)).as("n_votes"))
      .withColumn("vr", row_number().over(
        Window.partitionBy(col("probe_id")).orderBy(col("n_votes").desc, col("label"))))
      .filter(col("vr") === 1)
      .join(probes.select("probe_id", "true_label"), "probe_id")
      .select(col("probe_id"), col("label").as("pred_label"), col("n_votes"),
        col("true_label"),
        (col("label") === col("true_label")).cast("int").as("correct"))
      .collect().map(_.toSeq).toSet
    val got = AnnOps.knnClassify(spark, TestSpark.Sf).collect().map(_.toSeq).toSet
    assert(got.nonEmpty)
    assert(got === want)
  }

  test("cluster purity matches a window-assigned builtin-fold twin") {
    val corpus = e()
    val cents = corpus.filter(col("vec_id") < 16)
      .select(col("vec_id").as("cell"), col("embedding").as("c_emb"))
    val asg = corpus.crossJoin(cents)
      .withColumn("ccos", foldCos(col("c_emb"), col("embedding")))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("vec_id")).orderBy(col("ccos").desc, col("cell"))))
      .filter(col("rn") === 1)
      .select(col("vec_id"), col("cell"), col("label"))
    val counts = asg.groupBy("cell", "label").agg(count(lit(1)).as("n"))
    val want = counts.groupBy("cell")
      .agg(sum(col("n")).as("n_members"), count(lit(1)).as("n_labels"))
      .join(counts.withColumn("mr", row_number().over(
          Window.partitionBy(col("cell")).orderBy(col("n").desc, col("label"))))
        .filter(col("mr") === 1)
        .select(col("cell"), col("label").as("maj_label"), col("n").as("n_majority")),
        "cell")
      .select(col("cell"), col("n_members"), col("n_labels"), col("maj_label"),
        col("n_majority"),
        round(col("n_majority") / col("n_members").cast("double"), 6).as("purity"))
      .collect().map(_.toSeq).toSet
    val got = AnnOps.clusterPurity(spark, TestSpark.Sf).collect().map(_.toSeq).toSet
    assert(got.nonEmpty)
    assert(got === want)
  }
}
