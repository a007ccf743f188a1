package graft

import java.nio.file.Files

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Codecs

/** CSV/JSON round-trips preserve data exactly, including the quoting
  * edge cases the reference's hand parser handles
  * (dataManager.ts:220-240: embedded commas, doubled quotes).
  */
class CodecsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val schema = StructType(Seq(
    StructField("id", LongType),
    StructField("name", StringType)))

  private val tricky = Seq(
    (1L, """plain"""),
    (2L, """with, comma"""),
    (3L, """with "quotes" inside"""),
    (4L, """comma, and "quotes""""))

  test("csv round-trip with embedded commas and quotes") {
    import spark.implicits._
    val dir = Files.createTempDirectory("codec_csv").toString
    val df = tricky.toDF("id", "name")
    Codecs.exportCsv(df, dir, singleFile = true)
    val back = Codecs.importCsv(spark, dir, schema)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(back === tricky.toSet)
  }

  test("json round-trip") {
    import spark.implicits._
    val dir = Files.createTempDirectory("codec_json").toString
    val df = tricky.toDF("id", "name")
    Codecs.exportJson(df, dir, singleFile = true)
    val back = Codecs.importJson(spark, dir, schema)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(back === tricky.toSet)
  }

  test("orc round-trip preserves types without a schema argument") {
    import spark.implicits._
    val dir = Files.createTempDirectory("codec_orc").toString
    val df = tricky.toDF("id", "name")
      .withColumn("score", org.apache.spark.sql.functions.col("id") * 1.5)
    Codecs.exportOrc(df, dir)
    val back = Codecs.importOrc(spark, dir)
    assert(back.schema.map(f => (f.name, f.dataType)) ===
      Seq(("id", LongType), ("name", StringType), ("score", DoubleType)))
    val rows = back.collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
    assert(rows === tricky.map { case (i, n) => (i, n, i * 1.5) }.toSet)
  }
}
