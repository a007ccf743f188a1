package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** [[MultimodalOps.frameDedup]] — duplicate-frame detection. Expected
  * rows are rebuilt in plain Scala (java MessageDigest md5 over the
  * raw bytes, no Spark expressions), so the generator fan-out, the
  * hash aggregation and the ≥2-distinct-docs cut are all checked
  * against an independent implementation.
  */
class FrameDedupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val FrameBytes = 64

  private def md5hex(b: Array[Byte]): String =
    java.security.MessageDigest.getInstance("MD5").digest(b)
      .map("%02x".format(_)).mkString

  test("matches a scalar MessageDigest recomputation at sf0.001") {
    val docs = spark.read.parquet(s"${TestSpark.Sf}/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val frames = docs.flatMap { case (id, text) =>
      text.getBytes("UTF-8").grouped(FrameBytes).zipWithIndex
        .map { case (f, i) => (md5hex(f), id, i.toLong) }
    }
    val want = frames.groupBy(_._1).collect {
      case (fh, fs) if fs.map(_._2).distinct.length >= 2 =>
        (fh, fs.length.toLong, fs.map(_._2).distinct.length.toLong,
          fs.map(_._2).min, fs.map(_._3).min)
    }.toSet
    val got = MultimodalOps.frameDedup(spark, TestSpark.Sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSet
    assert(got.nonEmpty, "no duplicated frames on testdata")
    assert(got === want)
  }

  test("aggregation map-side combines; blob bytes do not ride the shuffle") {
    val df = MultimodalOps.frameDedup(spark, TestSpark.Sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("partial_count") || plan.contains("HashAggregate"),
      s"no partial aggregation in:\n$plan")
    // the exchange carries the 32-char hash, never the text column
    val exchangeDown = plan.split("Exchange hashpartitioning\\(fh").lift(1)
    assert(exchangeDown.isEmpty || !exchangeDown.get.take(400).contains("text#"),
      "text column crosses the hash exchange")
  }
}
