package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.sources.Tables

/** [[DedupOps.prototypes]] — the SSL-prototypes pruning profile. The
  * expected rows are rebuilt through rank windows over an
  * independently-computed assignment (zip-fold cosine via builtin
  * `aggregate`/`zip_with`, not the native expression), so both the
  * min-struct argmax and the bounded top-k shapes are checked against
  * naive twins built from different expression trees.
  */
class PrototypesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("matches a window-ranked naive twin with builtin-fold cosines at sf0.001") {
    val dir = TestSpark.Sf
    val cells = DedupOps.semCells(Tables.rowCount(spark, dir, "embeddings"))
    val e = Tables.embeddings(spark, dir).select(col("vec_id"), col("embedding"))
    def nrm(c: org.apache.spark.sql.Column) =
      sqrt(aggregate(c, lit(0.0), (acc, v) => acc + v.cast("double") * v.cast("double")))
    val cents = e.filter(col("vec_id") < cells)
      .select(col("vec_id").as("cell"), col("embedding").as("c_emb"))
    val asg = e.crossJoin(broadcast(cents))
      .withColumn("ccos", round(
        aggregate(zip_with(col("embedding"), col("c_emb"),
          (a, b) => a.cast("double") * b.cast("double")), lit(0.0), (acc, v) => acc + v)
          / (nrm(col("embedding")) * nrm(col("c_emb"))), 6))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("vec_id")).orderBy(col("ccos").desc, col("cell"))))
      .filter(col("rn") === 1)
      .select(col("vec_id"), col("cell"), col("ccos"))
    val stats = asg.groupBy("cell")
      .agg(count(lit(1)).as("n_members"),
        round(sum(col("ccos").cast("decimal(18,6)")).cast("double") / count(lit(1)), 6)
          .as("mean_ccos"))
    def rankedW(role: String, ord: Seq[org.apache.spark.sql.Column]) = asg
      .withColumn("rnk", row_number().over(
        Window.partitionBy(col("cell")).orderBy(ord: _*)).cast("long"))
      .filter(col("rnk") <= DedupOps.ProtoK)
      .select(col("cell"), lit(role).as("role"), col("rnk"), col("vec_id"), col("ccos"))
    val want = rankedW("proto", Seq(col("ccos").desc, col("vec_id")))
      .union(rankedW("edge", Seq(col("ccos"), col("vec_id"))))
      .join(stats, "cell")
      .select("cell", "role", "rnk", "vec_id", "ccos", "n_members", "mean_ccos")
      .collect().map(_.toSeq).toSet
    val got = DedupOps.prototypes(spark, dir).collect().map(_.toSeq).toSet
    assert(got.nonEmpty)
    assert(got === want)
  }

  test("membership counts cover the corpus; ranks bounded by k") {
    val rows = DedupOps.prototypes(spark, TestSpark.Sf).collect()
    val n = Tables.rowCount(spark, TestSpark.Sf, "embeddings")
    val perCell = rows.map(r => r.getLong(0) -> r.getLong(5)).toMap
    assert(perCell.values.sum === n)
    assert(rows.forall(_.getLong(2) <= DedupOps.ProtoK))
    // within a cell, proto rank 1 carries the max ccos, edge rank 1 the min
    rows.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      val proto1 = rs.find(r => r.getString(1) == "proto" && r.getLong(2) == 1L).get
      val edge1 = rs.find(r => r.getString(1) == "edge" && r.getLong(2) == 1L).get
      val all = rs.map(_.getDouble(4))
      assert(proto1.getDouble(4) === all.max)
      assert(edge1.getDouble(4) === all.min)
    }
  }
}
