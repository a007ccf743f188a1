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

  test("overlap: union estimate ≡ the sketch of the concatenated input (merge across KEYS)") {
    val sf = graft.TestSpark.Sf
    val e = graft.sources.Tables.events(spark, sf)
    val h = conv(substring(md5(col("user_id").cast("string").cast("binary")), 1, 15), 16, 10)
      .cast("long")
    val out = CoreOps.hllOverlap(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r).toMap
    assert(out.nonEmpty)
    out.foreach { case ((ta, tb), r) =>
      // re-sketch the UNION input directly: one register build over the
      // two types' rows as a single keyless group
      val direct = CoreOps.hllFromRegs(
        CoreOps.hllRegisters(
          e.filter(col("event_type").isin(ta, tb))
            .select(lit(1).as("g"), h.as("h")), Seq("g")), Seq("g"))
        .collect()(0).getDouble(1)
      assert(math.abs(BigDecimal(direct).setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble
        - r.getAs[Double]("hll_union")) < 1e-9,
        s"($ta,$tb): pairwise register-max must equal the direct union sketch")
    }
  }

  test("overlap: inclusion–exclusion arithmetic and the SIGNED intersection error") {
    val out = CoreOps.hllOverlap(spark, graft.TestSpark.Sf).collect()
    out.foreach { r =>
      val interExact = r.getAs[Long]("n_inter_exact")
      val hllInter = r.getAs[Double]("hll_inter")
      // err_inter is the SIGNED absolute error of the I–E estimate
      assert(math.abs(r.getAs[Double]("err_inter") - (hllInter - interExact)) <= 0.011,
        "err_inter must be hll_inter − n_inter_exact (signed, to rounding)")
      // union exact = |A| + |B| − |A∩B|
      assert(r.getAs[Long]("n_union_exact") ===
        r.getAs[Long]("n_exact_a") + r.getAs[Long]("n_exact_b") - interExact)
      // the sketches stay within sane error of exact on the real feed
      assert(math.abs(r.getAs[Double]("err_union")) < 0.10)
    }
  }
}
