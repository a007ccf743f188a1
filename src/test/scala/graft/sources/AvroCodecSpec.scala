package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The Avro codec's contract beyond the hash gate: every supported
  * primitive (nulls included, binary included) round-trips exactly
  * across MULTIPLE container files, type preservation needs no schema
  * argument (container header alone suffices — the sidecar is only a
  * fast path), unsupported types fail loudly at export, and the
  * container really is Avro (magic bytes, self-describing header).
  */
class AvroCodecSpec extends AnyFunSuite {

  private val spark = TestSpark.spark

  private val schema = StructType(Seq(
    StructField("id", LongType),
    StructField("flag", BooleanType),
    StructField("n", IntegerType),
    StructField("x", DoubleType),
    StructField("f", FloatType),
    StructField("s", StringType),
    StructField("b", BinaryType)))

  private def frame() = {
    val rows = (1L to 50L).map { i =>
      Row(i,
        if (i % 7 == 0) null else Boolean.box(i % 2 == 0),
        if (i % 5 == 0) null else Int.box(i.toInt * 3),
        if (i % 4 == 0) null else Double.box(i * 1.25),
        if (i % 6 == 0) null else Float.box(i * 0.5f),
        if (i % 3 == 0) null else s"value-$i with, comma",
        if (i % 8 == 0) null else Array.tabulate(4)(j => (i + j).toByte))
    }
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 5), schema)
  }

  private def canon(r: Row): Seq[Any] = r.toSeq.map {
    case a: Array[Byte] => a.toSeq
    case v => v
  }

  test("all primitives + nulls round-trip exactly across multiple container files") {
    val tmp = Files.createTempDirectory("avro_spec").toString
    val df = frame()
    AvroCodec.exportAvro(df, tmp)
    val parts = new java.io.File(tmp).listFiles().filter(_.getName.endsWith(".avro"))
    assert(parts.length === 5, "one container per partition")
    val back = AvroCodec.importAvro(spark, tmp)
    assert(back.schema.fields.map(f => (f.name, f.dataType)).toSeq ===
      schema.fields.map(f => (f.name, f.dataType)).toSeq)
    assert(back.collect().map(canon).sortBy(_.head.asInstanceOf[Long].toString).toSeq ===
      df.collect().map(canon).sortBy(_.head.asInstanceOf[Long].toString).toSeq)
  }

  test("the container header alone suffices: import works with the sidecar deleted") {
    val tmp = Files.createTempDirectory("avro_spec2").toString
    AvroCodec.exportAvro(frame(), tmp)
    Files.delete(java.nio.file.Paths.get(tmp, "_schema.avsc"))
    val back = AvroCodec.importAvro(spark, tmp)
    assert(back.count() === 50L)
    assert(back.schema.fieldNames.toSeq === schema.fieldNames.toSeq)
  }

  test("the files really are Avro object containers (magic 'Obj\\u0001')") {
    val tmp = Files.createTempDirectory("avro_spec3").toString
    AvroCodec.exportAvro(frame(), tmp, singleFile = true)
    val f = new java.io.File(tmp).listFiles().filter(_.getName.endsWith(".avro")).head
    val head = Files.readAllBytes(f.toPath).take(4)
    assert(head.toSeq === Seq[Byte]('O', 'b', 'j', 1))
  }

  test("unsupported Spark types fail loudly at export, never coerce silently") {
    val bad = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(Row(java.math.BigDecimal.ONE))),
      StructType(Seq(StructField("d", DecimalType(10, 2)))))
    val e = intercept[IllegalArgumentException] {
      AvroCodec.exportAvro(bad, Files.createTempDirectory("avro_bad").toString)
    }
    assert(e.getMessage.contains("unsupported"))
  }

  test("export overwrites a previous export (the sibling codecs' mode)") {
    val tmp = Files.createTempDirectory("avro_spec4").toString
    AvroCodec.exportAvro(frame(), tmp)
    AvroCodec.exportAvro(frame().limit(10), tmp, singleFile = true)
    assert(AvroCodec.importAvro(spark, tmp).count() === 10L)
  }

  test("export commits via attempt-unique temp + atomic rename: no .tmp residue") {
    val tmp = Files.createTempDirectory("avro_spec5").toString
    AvroCodec.exportAvro(frame(), tmp)
    val names = new java.io.File(tmp).listFiles().map(_.getName).toSeq
    assert(names.count(_.endsWith(".avro")) > 1, "multi-partition export expected")
    assert(!names.exists(_.endsWith(".tmp")),
      s"temp files must be renamed away on commit: $names")
    // and the committed files are each complete containers
    assert(AvroCodec.importAvro(spark, tmp).count() === 50L)
  }
}
