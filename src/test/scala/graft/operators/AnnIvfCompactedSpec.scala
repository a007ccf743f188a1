package graft.operators

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Vector-index delete maintenance: a TOMBSTONED nearest neighbor
  * must leave the index (not be post-filtered — the layout itself is
  * built on the live set), the naive uncompacted search must
  * demonstrate the bug (it returns the deleted vector), a newer
  * re-insert resurrects, and the registered query differs from plain
  * q_ann_ivf exactly by the live-set cut.
  */
class AnnIvfCompactedSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  // 40 deterministic 4-d vectors; 30 is planted as probe 0's twin,
  // 31 as the slightly-farther live alternative
  private def embFrame(): DataFrame = {
    import spark.implicits._
    (0 until 40).map { id =>
      val v: Array[Float] = id match {
        case 0 => Array(1f, 0f, 0f, 0f)
        case 30 => Array(1f, 0.001f, 0f, 0f) // nearest to probe 0
        case 31 => Array(1f, 0.05f, 0f, 0f) // next-nearest, alive
        case _ => Array(
          math.cos(id * 0.7).toFloat, math.sin(id * 0.7).toFloat,
          math.cos(id * 1.3).toFloat, math.sin(id * 1.3).toFloat)
      }
      (id.toLong, v)
    }.toDF("vec_id", "embedding")
  }

  // (event_id, ts_ns, user_id, op)
  private def feed(rows: Seq[(Long, Long, Long, String)]): DataFrame = {
    import spark.implicits._
    rows.toDF("event_id", "ts_ns", "user_id", "op")
  }

  private def top(out: DataFrame, probe: Long): Seq[Long] =
    out.collect().filter(_.getLong(0) == probe).sortBy(_.getLong(3)).map(_.getLong(1)).toSeq

  test("a tombstoned nearest neighbor leaves the index; the naive search returns it") {
    val e = embFrame()
    val withDelete = feed(Seq((1L, 100L, 30L, "u"), (2L, 200L, 30L, "d")))
    val got = top(AnnOps.annIvfCompactedFrom(withDelete, e), 0L)
    assert(!got.contains(30L), s"tombstoned vec 30 must be gone, got $got")
    assert(got.contains(31L), "the live next-nearest must take its place")
    // the counterexample: no tombstone at the head → 30 is rank 1
    val naive = top(AnnOps.annIvfCompactedFrom(
      feed(Seq((1L, 100L, 30L, "u"))), e), 0L)
    assert(naive.head === 30L,
      s"without the delete the twin is the top hit, got $naive")
  }

  test("a newer re-insert resurrects the vector") {
    val e = embFrame()
    val resurrect = feed(Seq(
      (1L, 100L, 30L, "u"), (2L, 200L, 30L, "d"), (3L, 300L, 30L, "u")))
    val got = top(AnnOps.annIvfCompactedFrom(resurrect, e), 0L)
    assert(got.head === 30L, s"resurrected vec 30 must return, got $got")
  }

  test("a tombstoned ANCHOR/PROBE id changes the layout, not just the results") {
    val e = embFrame()
    // kill probe 5 (an anchor id too): its result group disappears
    val out = AnnOps.annIvfCompactedFrom(
      feed(Seq((1L, 100L, 5L, "d"))), e).collect()
    assert(!out.exists(_.getLong(0) == 5L), "a dead probe must not search")
    assert(!out.exists(_.getLong(1) == 5L), "a dead vector must not be returned")
  }

  test("registered query = q_ann_ivf on the live set (corpus composition)") {
    val sf = TestSpark.Sf
    val got = AnnOps.annIvfCompacted(spark, sf).collect()
    assert(got.nonEmpty)
    // every returned vec survived compaction: its head op is not 'd'
    val dead = CdcOps.changeFeed(spark, sf)
      .withColumn("rn", org.apache.spark.sql.functions.row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(org.apache.spark.sql.functions.col("user_id"))
          .orderBy(org.apache.spark.sql.functions.col("ts_ns").desc,
            org.apache.spark.sql.functions.col("event_id").desc)))
      .filter("rn = 1 AND op = 'd'")
      .select("user_id").collect().map(_.getLong(0)).toSet
    assert(got.forall(r => !dead.contains(r.getLong(1))),
      "no tombstoned vec_id may appear in results")
    assert(got.forall(r => !dead.contains(r.getLong(0))),
      "no tombstoned probe may search")
  }
}
