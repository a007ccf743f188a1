package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{Bucketing, Tables}

/** Proves the SCALE.md claim: co-bucketing the two fact tables on
  * orderkey removes the join shuffle entirely, and the join result is
  * unchanged.
  */
class BucketingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("co-bucketed fact-fact join plans without a shuffle exchange and matches the plain join") {
    val orders = Tables.orders(spark, TestSpark.Sf)
    val lineitem = Tables.lineitem(spark, TestSpark.Sf)

    Bucketing.writeBucketed(orders, "b_orders", "o_orderkey", 8)
    Bucketing.writeBucketed(
      lineitem.withColumnRenamed("l_orderkey", "o_orderkey"), "b_lineitem", "o_orderkey", 8)
    // at sf0.001 a fact-fact join would auto-broadcast; force the
    // sort-merge path the claim is about (restored below)
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val plain = orders.join(
          lineitem.withColumnRenamed("l_orderkey", "o_orderkey"), "o_orderkey")
        .groupBy("o_orderstatus").agg(round(sum("l_extendedprice"), 2).as("rev"))
      val bucketed = spark.table("b_orders").join(spark.table("b_lineitem"), "o_orderkey")
        .groupBy("o_orderstatus").agg(round(sum("l_extendedprice"), 2).as("rev"))

      // the plain join shuffles; the bucketed one must not
      assert(Bucketing.hasShuffleExchange(
        orders.join(lineitem.withColumnRenamed("l_orderkey", "o_orderkey"), "o_orderkey")))
      assert(!Bucketing.hasShuffleExchange(
        spark.table("b_orders").join(spark.table("b_lineitem"), "o_orderkey")))

      // identical results
      val p = plain.collect().map(r => (r.getString(0), r.getDouble(1))).toSet
      val b = bucketed.collect().map(r => (r.getString(0), r.getDouble(1))).toSet
      assert(p === b && p.nonEmpty)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      Bucketing.dropTable(spark, "b_orders")
      Bucketing.dropTable(spark, "b_lineitem")
    }
  }
}
