package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class AsOfJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("backward as-of: latest prior right row per key, ties by strictness, tolerance window") {
    import spark.implicits._
    val quotes = Seq( // key, time, px
      ("a", 10L, 1.0), ("a", 20L, 2.0), ("a", 30L, 3.0),
      ("b", 15L, 9.0)).toDF("sym", "qt", "px")
    val trades = Seq( // key, time
      ("a", 5L), ("a", 20L), ("a", 25L), ("a", 99L),
      ("b", 14L), ("c", 50L)).toDF("sym", "tt")

    def run(strict: Boolean, tol: Option[Long] = None) =
      AsOfJoin.backward(trades, quotes, Seq("sym"), "tt", "qt", Seq("px"), tol, strict)
        .select($"sym", $"tt", $"_asof_px").collect()
        .map(r => (r.getString(0), r.getLong(1),
          if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toSet

    // ≤ semantics: the 20-quote is visible to the 20-trade
    assert(run(strict = false) === Set(
      ("a", 5L, None), ("a", 20L, Some(2.0)), ("a", 25L, Some(2.0)), ("a", 99L, Some(3.0)),
      ("b", 14L, None), ("c", 50L, None)))
    // strict <: the 20-trade only sees the 10-quote
    assert(run(strict = true) === Set(
      ("a", 5L, None), ("a", 20L, Some(1.0)), ("a", 25L, Some(2.0)), ("a", 99L, Some(3.0)),
      ("b", 14L, None), ("c", 50L, None)))
    // tolerance 10: the 99-trade's 30-quote is too old and nulls out
    assert(run(strict = false, tol = Some(10L)) === Set(
      ("a", 5L, None), ("a", 20L, Some(2.0)), ("a", 25L, Some(2.0)), ("a", 99L, None),
      ("b", 14L, None), ("c", 50L, None)))
  }

  test("row atomicity: a NULL in one right value column is carried as-is, not patched from an older row") {
    import spark.implicits._
    // newest quote has px = NULL: the carried (_asof_px, _asof_src)
    // must BOTH come from that row — a per-column last(ignoreNulls)
    // would resurrect the 10-quote's px under the 20-quote's src
    val quotes = Seq(
      ("a", 10L, Some(1.0), "old"),
      ("a", 20L, None, "new")).toDF("sym", "qt", "px", "src")
    val trades = Seq(("a", 25L)).toDF("sym", "tt")
    val out = AsOfJoin.backward(trades, quotes, Seq("sym"), "tt", "qt", Seq("px", "src"))
      .select($"_asof_t", $"_asof_px", $"_asof_src").collect().head
    assert(out.getLong(0) === 20L)
    assert(out.isNullAt(1))
    assert(out.getString(2) === "new")
  }

  test("deterministic tie among right rows at the same (key, time): greatest payload wins, repartition-stable") {
    import spark.implicits._
    val quotes = Seq(
      ("a", 10L, 1.0, "x"), ("a", 10L, 2.0, "y"), ("a", 10L, 2.0, "b")).toDF("sym", "qt", "px", "src")
    val trades = Seq(("a", 25L)).toDF("sym", "tt")
    def run(q: org.apache.spark.sql.DataFrame) =
      AsOfJoin.backward(trades, q, Seq("sym"), "tt", "qt", Seq("px", "src"))
        .select($"_asof_px", $"_asof_src").collect().head
    val expected = (2.0, "y") // greatest (t, px, src) struct
    for (q <- Seq(quotes, quotes.repartition(7), quotes.orderBy($"src"))) {
      val r = run(q)
      assert((r.getDouble(0), r.getString(1)) === expected)
    }
  }

  test("generic as-of reproduces the specialized purchase attribution on real events") {
    import spark.implicits._
    val sf = TestSpark.Sf
    val ev = graft.sources.Tables.events(spark, sf)
    val purchases = ev.filter($"event_type" === "purchase").select($"user_id", $"event_id", $"ts_ns")
    val clicks = ev.filter($"event_type" === "click").select($"user_id", $"event_id", $"ts_ns")

    val viaLib = AsOfJoin.backward(
        purchases, clicks, Seq("user_id"), "ts_ns", "ts_ns", Seq("event_id"))
      .select($"user_id", $"event_id".as("purchase_id"),
        $"_asof_event_id".as("attributed_click_id"),
        expr("(ts_ns - _asof_t) DIV 1000000000").as("gap_s"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) -1L else r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3))).toSet

    val specialized = CdcOps.asofAttribution(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) -1L else r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3))).toSet

    assert(viaLib === specialized)
  }
}
