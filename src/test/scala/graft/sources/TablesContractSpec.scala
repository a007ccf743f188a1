package graft.sources

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Pins the LOADER CONTRACT for every table: the dtypes downstream
  * queries assume, asserted in one place. The driver regenerates the
  * testdata between rounds and has already changed a physical
  * encoding once (events.ts: TIMESTAMP(NANOS) → timestamp[us]), which
  * surfaced as 22 scattered real-feed spec failures and 11 broken
  * queries instead of one named assertion. This spec is that
  * assertion: a future retype fails HERE, with a message saying which
  * table and column moved.
  */
class TablesContractSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.Sf

  private def fields(name: String): Map[String, DataType] = {
    val df = name match {
      case "events" => Tables.events(spark, sf)
      case other    => Tables.load(spark, sf, other)
    }
    df.schema.fields.map(f => f.name -> f.dataType).toMap
  }

  private def assertSchema(table: String, expected: Map[String, DataType]): Unit = {
    val actual = fields(table)
    for ((c, t) <- expected)
      assert(actual.get(c).contains(t),
        s"$table.$c: expected $t, loader yields ${actual.get(c)} — " +
          "the driver's testdata encoding moved; fix the loader contract in Tables")
    assert(actual.keySet == expected.keySet,
      s"$table columns changed: loader yields ${actual.keySet.toSeq.sorted}, " +
        s"contract pins ${expected.keySet.toSeq.sorted}")
  }

  test("events loader yields the integer-ns contract regardless of physical encoding") {
    assertSchema("events", Map(
      "event_id" -> LongType, "ts_ns" -> LongType, "user_id" -> LongType,
      "event_type" -> StringType, "value" -> DoubleType, "props" -> StringType))
  }

  test("events.ts_ns values are epoch NANOSECONDS, not seconds/millis/micros") {
    // a wrong-scale conversion (µs kept as-is, or s*1e9 overflow) lands
    // outside [2001, 2096] in ns-epoch terms; the testdata is ~now
    import org.apache.spark.sql.functions._
    val r = Tables.events(spark, sf)
      .agg(min(col("ts_ns")).as("lo"), max(col("ts_ns")).as("hi")).head()
    val (lo, hi) = (r.getLong(0), r.getLong(1))
    assert(lo > 1000000000000000000L, s"ts_ns min $lo is below year-2001 in ns — wrong unit?")
    assert(hi < 4000000000000000000L, s"ts_ns max $hi is above year-2096 in ns — wrong unit?")
  }

  test("streaming fileSourceEvents honors the same ts_ns long contract") {
    // a CDC landing dir holds only event files — stage one there
    val feed = java.nio.file.Files.createTempDirectory("graft-feed-contract")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(sf, "events.parquet"),
      feed.resolve("events.parquet"))
    val stream = graft.streaming.CdcStream.fileSourceEvents(spark, feed.toString)
    assert(stream.isStreaming)
    val byName = stream.schema.fields.map(f => f.name -> f.dataType).toMap
    assert(byName.get("ts_ns").contains(LongType),
      s"streaming feed yields ${byName.get("ts_ns")} for ts_ns; contract is LongType")
  }

  test("dimension and fact loaders keep their pinned dtypes") {
    assertSchema("region", Map("r_regionkey" -> IntegerType, "r_name" -> StringType))
    assertSchema("nation", Map(
      "n_nationkey" -> IntegerType, "n_name" -> StringType, "n_regionkey" -> IntegerType))
    assertSchema("customer", Map(
      "c_custkey" -> LongType, "c_name" -> StringType, "c_nationkey" -> IntegerType,
      "c_acctbal" -> DoubleType, "c_mktsegment" -> StringType))
    assertSchema("supplier", Map(
      "s_suppkey" -> LongType, "s_name" -> StringType, "s_nationkey" -> IntegerType,
      "s_acctbal" -> DoubleType))
    assertSchema("part", Map(
      "p_partkey" -> LongType, "p_name" -> StringType, "p_brand" -> StringType,
      "p_type" -> StringType, "p_size" -> IntegerType, "p_retailprice" -> DoubleType))
    assertSchema("orders", Map(
      "o_orderkey" -> LongType, "o_custkey" -> LongType, "o_orderstatus" -> StringType,
      "o_totalprice" -> DoubleType, "o_orderdate" -> TimestampNTZType,
      "o_orderpriority" -> StringType))
    assertSchema("lineitem", Map(
      "l_orderkey" -> LongType, "l_partkey" -> LongType, "l_suppkey" -> LongType,
      "l_linenumber" -> IntegerType, "l_quantity" -> DoubleType,
      "l_extendedprice" -> DoubleType, "l_discount" -> DoubleType, "l_tax" -> DoubleType,
      "l_returnflag" -> StringType, "l_linestatus" -> StringType,
      "l_shipdate" -> TimestampNTZType))
    assertSchema("documents", Map(
      "doc_id" -> LongType, "text" -> StringType, "lang" -> StringType,
      "source" -> StringType, "n_chars" -> LongType))
    assertSchema("embeddings", Map(
      "vec_id" -> LongType, "embedding" -> ArrayType(FloatType), "label" -> IntegerType))
  }
}
