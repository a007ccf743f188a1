package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Incremental view maintenance must be indistinguishable from a full
  * recompute: merging a compacted base with a compacted delta equals
  * compacting the concatenated feed, and the maintained aggregate
  * equals the aggregate of the merged state — across every CDC
  * transition (insert, update, delete, resurrect, delete-of-unknown,
  * late-arriving change older than a retained tombstone).
  */
class IvmSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  // (event_id, ts_ns, user_id, op, event_type, value)
  private def feedDf(rows: Seq[(Long, Long, Long, String, String, Double)]): DataFrame = {
    import spark.implicits._
    rows.toDF("event_id", "ts_ns", "user_id", "op", "event_type", "value")
  }

  // base: u1 live, u2 live, u3 deleted (tombstone retained), u4 live
  private val base = feedDf(Seq(
    (1L, 100L, 1L, "c", "signup", 10.0),
    (2L, 200L, 1L, "u", "click", 20.0),
    (3L, 150L, 2L, "c", "signup", 30.0),
    (4L, 300L, 3L, "c", "signup", 40.0),
    (5L, 400L, 3L, "d", "signup", 40.0),
    (6L, 500L, 4L, "c", "purchase", 55.0)))

  // delta exercises every transition:
  //   u1 updated; u2 deleted; u3 resurrected by a newer insert;
  //   u5 brand-new; u6 delete of a never-seen key;
  //   u4 receives a LATE change older than its base record (ignored)
  private val delta = feedDf(Seq(
    (10L, 900L, 1L, "u", "purchase", 99.0),
    (11L, 950L, 2L, "d", "signup", 30.0),
    (12L, 960L, 3L, "c", "signup", 41.0),
    (13L, 970L, 5L, "c", "click", 7.0),
    (14L, 980L, 6L, "d", "click", 1.0),
    (15L, 450L, 4L, "u", "click", 0.5)))

  private def stateMap(state: DataFrame): Map[Long, (Long, String, Boolean)] =
    state.collect().map(r => r.getAs[Long]("user_id") ->
      ((r.getAs[Long]("last_event_id"), r.getAs[String]("last_type"),
        r.getAs[Boolean]("deleted")))).toMap

  test("mergeState(compact(base), compact(delta)) equals compact(base ∪ delta)") {
    val merged = Ivm.mergeState(Ivm.compactSlice(base), Ivm.compactSlice(delta))
    val direct = Ivm.compactSlice(base.unionByName(delta))
    assert(stateMap(merged) === stateMap(direct))
  }

  test("every CDC transition lands in the expected state") {
    val m = stateMap(Ivm.mergeState(Ivm.compactSlice(base), Ivm.compactSlice(delta)))
    assert(m(1L) === ((10L, "purchase", false)), "update wins")
    assert(m(2L) === ((11L, "signup", true)), "delete tombstones a live key")
    assert(m(3L) === ((12L, "signup", false)), "newer insert resurrects a deleted key")
    assert(m(5L) === ((13L, "click", false)), "brand-new key inserts")
    assert(m(6L) === ((14L, "click", true)), "delete of an unseen key is a retained tombstone")
    assert(m(4L) === ((6L, "purchase", false)), "late change older than base is ignored")
  }

  test("maintainView equals the view of the merged state (and of a full recompute)") {
    val baseState = Ivm.compactSlice(base)
    val deltaCompact = Ivm.compactSlice(delta)
    val maintained = Ivm.maintainView(Ivm.typeView(baseState), baseState, deltaCompact)
    val recomputed = Ivm.typeView(Ivm.compactSlice(base.unionByName(delta)))
    def m(df: DataFrame) = df.collect()
      .map(r => r.getAs[String]("last_type") ->
        ((r.getAs[Long]("n_entities"), math.round(r.getAs[Double]("sum_value") * 100))))
      .toMap
    assert(m(maintained) === m(recomputed))
    // the view never carries zero-count groups (u2's 'signup' slot drops to
    // base-only members, not an empty residue)
    assert(m(maintained).values.forall(_._1 > 0))
  }

  test("midpoint cut is LongType integer ns, and a timestamp feed fails loudly") {
    import org.apache.spark.sql.types.LongType
    import org.apache.spark.sql.functions.col
    // the contract: the cut is integer-ns arithmetic from ts_ns: Long,
    // never interval arithmetic on a timestamp (round 8's silent drift)
    val cut = CdcOps.midpointCut(feedDf(Seq((1L, 10L, 1L, "c", "signup", 1.0))))
    assert(cut.schema("cut_ns").dataType === LongType)
    val tsFeed = feedDf(Seq((1L, 10L, 1L, "c", "signup", 1.0)))
      .withColumn("ts_ns", col("ts_ns").cast("timestamp"))
    intercept[org.apache.spark.sql.AnalysisException] {
      CdcOps.midpointCut(tsFeed).head()
    }
  }

  test("midpointSplit survives an input that already carries an _ivm_cut column") {
    val df = feedDf(Seq(
      (1L, 100L, 1L, "c", "signup", 10.0),
      (2L, 200L, 2L, "c", "signup", 20.0),
      (3L, 300L, 3L, "c", "signup", 30.0),
      (4L, 400L, 4L, "c", "signup", 40.0)))
      .withColumn("_ivm_cut", lit(-1L)) // hostile pre-existing name
    val (b, d) = Ivm.midpointSplit(df, "ts_ns")
    // the split must key on ts_ns's real midpoint (250), not the
    // hostile column, and must preserve the caller's column untouched
    assert(b.select("ts_ns").as[Long](org.apache.spark.sql.Encoders.scalaLong)
      .collect().sorted.toSeq === Seq(100L, 200L))
    assert(d.select("ts_ns").as[Long](org.apache.spark.sql.Encoders.scalaLong)
      .collect().sorted.toSeq === Seq(300L, 400L))
    assert(b.columns.contains("_ivm_cut") &&
      b.select("_ivm_cut").distinct().collect().map(_.getLong(0)).toSeq === Seq(-1L))
  }

  test("maintainView on the real feed: midpoint split equals full recompute (sf0.001)") {
    val feed = CdcOps.changeFeed(spark, "/root/testdata/sf0.001").select(
      col("event_id"), col("ts_ns"), col("user_id"), col("op"),
      col("event_type"), col("value"))
    val Array(lo, hi) = feed.agg(min("ts_ns"), max("ts_ns")).collect()
      .flatMap(r => Array(r.getLong(0), r.getLong(1)))
    val cut = lo + (hi - lo) / 2
    val baseState = Ivm.compactSlice(feed.filter(col("ts_ns") <= cut))
    val deltaCompact = Ivm.compactSlice(feed.filter(col("ts_ns") > cut))
    assert(deltaCompact.limit(1).count() === 1L, "split must leave a non-empty delta")
    val maintained = Ivm.maintainView(Ivm.typeView(baseState), baseState, deltaCompact)
      .withColumn("sum_value", round(col("sum_value"), 2))
    val recomputed = Ivm.typeView(Ivm.compactSlice(feed))
      .withColumn("sum_value", round(col("sum_value"), 2))
    assert(maintained.exceptAll(recomputed).isEmpty &&
      recomputed.exceptAll(maintained).isEmpty)
  }
}
