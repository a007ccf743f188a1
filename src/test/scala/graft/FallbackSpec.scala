package graft

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{Fallback, Tables}

class FallbackSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val schema = Tables.nation(spark, TestSpark.Sf).schema
  private val real = s"${TestSpark.Sf}/nation.parquet"

  test("primary tier wins when it exists") {
    val df = Fallback.readWithFallback(spark, schema, Seq(real, "/nonexistent/b"))
    assert(df.select(col("_source_tier")).head.getInt(0) === 0)
    assert(df.count() > 0)
  }

  test("falls through missing tiers to the first that exists") {
    val df = Fallback.readWithFallback(spark, schema,
      Seq("/nonexistent/a", "/nonexistent/b", real))
    assert(df.select(col("_source_tier")).head.getInt(0) === 2)
    assert(df.count() > 0)
  }

  test("all tiers missing yields an empty frame with the declared schema, not a failure") {
    val df = Fallback.readWithFallback(spark, schema, Seq("/nonexistent/a", "/nonexistent/b"))
    assert(df.count() === 0)
    assert(df.schema.fieldNames.toSeq === schema.fieldNames.toSeq :+ "_source_tier")
  }
}
