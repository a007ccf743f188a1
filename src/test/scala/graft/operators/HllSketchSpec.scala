package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The HLL estimate must be (a) accurate to its design error and
  * (b) shard-mergeable: registers built per shard and merged by max
  * equal registers built over the union — the property that lets a
  * 1000-executor cluster sketch 100 TB without ever colocating a key.
  */
class HllSketchSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("estimate is within 10% of exact on the real feed (design error 3.25%)") {
    val rows = CoreOps.approxDistinct(spark, graft.TestSpark.Sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val err = math.abs(r.getAs[Double]("rel_err"))
      assert(err < 0.10,
        s"${r.getAs[String]("event_type")}: rel_err $err exceeds 10%")
    }
  }

  test("registers merge by max: sharded sketch equals whole-corpus sketch") {
    import spark.implicits._
    val n = 20000
    val ids = spark.range(n).select((col("id") * 7919 % 65537).as("user_id"))
    def regs(df: org.apache.spark.sql.DataFrame) = df
      .withColumn("h",
        conv(substring(md5(col("user_id").cast("string").cast("binary")), 1, 15), 16, 10)
          .cast("long"))
      .withColumn("bucket", expr("h % 1024"))
      .withColumn("w", expr("h DIV 1024"))
      .withColumn("rho", when(col("w") === 0, 51).otherwise(lit(51) - length(bin(col("w")))))
      .groupBy("bucket").agg(max("rho").as("rho"))
    val whole = regs(ids).as[(Long, Int)].collect().toMap
    val shardA = regs(ids.filter(col("user_id") % 3 === 0))
    val shardB = regs(ids.filter(col("user_id") % 3 =!= 0))
    val merged = shardA.unionByName(shardB)
      .groupBy("bucket").agg(max("rho").as("rho"))
      .as[(Long, Int)].collect().toMap
    assert(merged === whole)
  }
}
