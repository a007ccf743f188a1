package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.CoreOps
import graft.streaming.HllStream
import graft.streaming.HllStream.{Estimate, KeyedHash}

/** The streaming HLL's contract is EXACT equality with the batch
  * sketch — not approximation: same hash, same registers, same
  * integer scaled-sum, same correction, so after every micro-batch
  * the per-key estimate must equal [[CoreOps]]'s batch pipeline run
  * over the same prefix, bit for bit.
  */
class HllStreamSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.Sf

  /** The batch pipeline over an explicit (key, h) set — the oracle
    * the stream must match exactly.
    */
  private def batchEst(rows: Seq[KeyedHash]): Map[String, Double] = {
    import spark.implicits._
    val keyed = rows.toDF("key", "h")
    CoreOps.hllFromRegs(CoreOps.hllRegisters(keyed, Seq("key")), Seq("key"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
  }

  test("scalar rho/estimate mirror the batch expressions on the real feed's hashes") {
    import spark.implicits._
    val hashed = graft.sources.Tables.events(spark, sf)
      .select(col("event_type").as("key"), CoreOps.hash60(col("user_id").cast("string")).as("h"))
      .as[KeyedHash].collect().toSeq
    // batch register table, rebuilt scalar-side
    val regsSql = CoreOps.hllRegisters(hashed.toDF("key", "h"), Seq("key"))
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getInt(2)).toMap
    val regsScalar = hashed.groupBy(o => (o.key, o.h % CoreOps.HllM))
      .map { case (k, os) => k -> os.map(o => HllStream.rho(o.h)).max }
    assert(regsScalar === regsSql, "scalar rho must equal the SQL register build")
  }

  test("stream equals batch per key after EVERY micro-batch, exactly, on the real feed") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val hashed = graft.sources.Tables.events(spark, sf)
      .select(col("event_type").as("key"), CoreOps.hash60(col("user_id").cast("string")).as("h"))
      .as[KeyedHash].collect().toSeq
    val chunks = hashed.grouped(math.max(hashed.size / 3, 1)).toSeq

    val input = MemoryStream[KeyedHash]
    val q = HllStream.perKey(spark, input.toDS())
      .writeStream.format("memory").queryName("hllstream")
      .outputMode(OutputMode.Update).start()
    try {
      var prefix = Seq.empty[KeyedHash]
      chunks.foreach { c =>
        prefix ++= c
        input.addData(c)
        q.processAllAvailable()
        // latest emission per key ⇒ the state after this batch
        val got = spark.table("hllstream").as[Estimate].collect()
          .groupBy(_.key).map { case (k, es) => k -> es.maxBy(_.n_items) }
        val want = batchEst(prefix)
        val seen = prefix.groupBy(_.key).map { case (k, v) => k -> v.size.toLong }
        want.foreach { case (k, est) =>
          assert(got(k).est === est, s"key $k after ${prefix.size} rows: stream must equal batch EXACTLY")
          assert(got(k).n_items === seen(k), s"key $k n_items")
        }
      }
    } finally q.stop()
  }

  test("estimates stay within HLL error bounds against exact distincts") {
    import spark.implicits._
    val hashed = graft.sources.Tables.events(spark, sf)
      .select(col("event_type").as("key"), CoreOps.hash60(col("user_id").cast("string")).as("h"),
        col("user_id"))
    val exact = hashed.groupBy("key").agg(countDistinct("user_id").as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val est = batchEst(hashed.select(col("key"), col("h")).as[KeyedHash].collect().toSeq)
    est.foreach { case (k, e) =>
      val rel = math.abs(e - exact(k)) / exact(k).toDouble
      assert(rel < 0.15, s"key $k: |$e - ${exact(k)}| rel err $rel out of sketch bounds")
    }
  }
}
