package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** SCD2 invariants on the real change feed: interval chaining,
  * current-row uniqueness, tombstone exclusion, and the cross-operator
  * contract that the current slice of the history IS the compacted
  * snapshot ([[CdcOps.cdcCompact]]) — the defining property of a
  * type-2 dimension.
  */
class Scd2Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.Sf

  private lazy val hist = CdcOps.scd2(spark, sf).cache()

  test("is_current marks exactly the null-valid_to rows, at most one per key") {
    assert(hist.filter(col("is_current") =!= col("valid_to_s").isNull).count() === 0)
    val dupCurrent = hist.filter(col("is_current"))
      .groupBy("user_id").count().filter(col("count") > 1).count()
    assert(dupCurrent === 0)
  }

  test("history rows = change feed minus tombstones") {
    val feed = CdcOps.changeFeed(spark, sf)
    assert(hist.count() === feed.filter(col("op") =!= "d").count())
  }

  test("intervals never overlap within a key and close no earlier than they open") {
    assert(hist.filter(col("valid_to_s") < col("valid_from_s")).count() === 0)
    // half-open-interval overlap self-join; an open interval (null
    // valid_to) extends to +inf. Sub-second truncation can only SHRINK
    // intervals, so any overlap found here is a genuine bug.
    val a = hist.select(col("user_id"), col("event_id").as("a_id"),
      col("valid_from_s").as("a_from"), col("valid_to_s").as("a_to"))
    val b = hist.select(col("user_id"), col("event_id").as("b_id"),
      col("valid_from_s").as("b_from"), col("valid_to_s").as("b_to"))
    val overlaps = a.join(b, Seq("user_id"))
      .filter(col("a_id") < col("b_id"))
      .filter((col("b_to").isNull || col("a_from") < col("b_to")) &&
        (col("a_to").isNull || col("b_from") < col("a_to")))
    assert(overlaps.count() === 0)
  }

  test("the current slice equals the compacted snapshot (deletes excluded, resurrections included)") {
    val current = hist.filter(col("is_current"))
      .select(col("user_id"), col("event_id").as("last_event_id"),
        col("event_type").as("last_type"), col("value").as("last_value"))
    val snap = CdcOps.cdcCompact(spark, sf)
      .select("user_id", "last_event_id", "last_type", "last_value")
    assert(current.exceptAll(snap).count() === 0)
    assert(snap.exceptAll(current).count() === 0)
    assert(snap.count() > 0)
  }

  test("snapshot at the midpoint cut equals compaction of the log prefix (time travel)") {
    import org.apache.spark.sql.expressions.Window
    val feed = CdcOps.changeFeed(spark, sf)
    val mm = feed.agg(min(col("ts_ns")), max(col("ts_ns"))).collect()(0)
    val cut = mm.getLong(0) + (mm.getLong(1) - mm.getLong(0)) / 2
    // independent shape: latest-wins compaction over the truncated log
    val w = Window.partitionBy("user_id")
      .orderBy(col("ts_ns").desc, col("event_id").desc)
    val expected = feed.filter(col("ts_ns") <= cut)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1 && col("op") =!= "d")
      .select(col("user_id"), col("event_id").as("asof_event_id"),
        col("event_type").as("asof_type"), round(col("value"), 2).as("asof_value"))
    val got = CdcOps.scd2SnapshotAt(spark, sf)
      .select("user_id", "asof_event_id", "asof_type", "asof_value")
    assert(expected.count() > 0)
    assert(got.exceptAll(expected).count() === 0)
    assert(expected.exceptAll(got).count() === 0)
  }

  test("incremental maintenance (base + delta merge) equals the full rebuild row for row") {
    val full = CdcOps.scd2(spark, sf)
    val inc = CdcOps.scd2Incremental(spark, sf)
    assert(full.count() > 0)
    assert(inc.exceptAll(full).count() === 0)
    assert(full.exceptAll(inc).count() === 0)
    // the merge is non-trivial: some base keys ARE touched by the delta
    // (their open interval closed at a delta change)
    val feed = CdcOps.changeFeed(spark, sf)
    val mm = feed.agg(min(col("ts_ns")), max(col("ts_ns"))).collect()(0)
    val cut = mm.getLong(0) + (mm.getLong(1) - mm.getLong(0)) / 2
    val touched = feed.filter(col("ts_ns") <= cut).select("user_id")
      .intersect(feed.filter(col("ts_ns") > cut).select("user_id")).count()
    assert(touched > 0, "delta touched no base key — the merge path was not exercised")
  }

  test("a key whose newest record is a tombstone has a closed history and no current row") {
    import spark.implicits._
    // event_ids are chosen so the md5-derived op tag is FORCED: the
    // feed tags event_id e as a delete iff hex32(md5(e)) % 10 == 0 —
    // find real ids with and without that property rather than hoping
    // the tiny sf feed happens to end a key on a tombstone
    def isDelete(id: Long): Boolean = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
      val hex = d.take(4).map(b => f"$b%02x").mkString
      java.lang.Long.parseLong(hex, 16) % 10 == 0
    }
    val delId = (1L to 1000L).find(isDelete).get
    val updIds = (1L to 1000L).filterNot(isDelete).take(3)
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def ts(m: Int) = new java.sql.Timestamp(base.getTime + m * 60000L)
    // user 1: two updates then a tombstone; user 2: one update only
    val dir = java.nio.file.Files.createTempDirectory("scd2").toString
    Seq(
      (updIds(0), ts(0), 1L, "click", 1.0),
      (updIds(1), ts(1), 1L, "click", 2.0),
      (delId,     ts(2), 1L, "click", 3.0),
      (updIds(2), ts(0), 2L, "view",  4.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val h = CdcOps.scd2(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getAs[Any]("valid_to_s"),
        r.getBoolean(r.fieldIndex("is_current"))))
    val u1 = h.filter(_._1 == 1L)
    assert(u1.length === 2, s"tombstone must not appear as a history row: ${u1.toSeq}")
    assert(u1.forall(!_._4), "the deleted key must have NO current row")
    assert(u1.forall(_._3 != null), "every interval of the deleted key must be closed")
    val u2 = h.filter(_._1 == 2L)
    assert(u2.length === 1 && u2.head._4 && u2.head._3 == null)
    // and the compacted snapshot agrees: user 1 absent, user 2 present
    val snapUsers = CdcOps.cdcCompact(spark, dir)
      .select("user_id").collect().map(_.getLong(0)).toSet
    assert(snapUsers === Set(2L))
  }
}
