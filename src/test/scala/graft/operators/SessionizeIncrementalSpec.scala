package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The incremental sessionization's contract beyond the hash gate:
  * registered incremental ≡ registered batch on executed plans, the
  * boundary MERGE and the continued session numbering pinned on a
  * planted frame, and the gate corpus genuinely exercising
  * cross-boundary sessions (else the oracle never tests the merge).
  */
class SessionizeIncrementalSpec extends AnyFunSuite {

  private val spark = TestSpark.spark
  import spark.implicits._

  test("incremental ≡ the registered batch sessionization on executed plans (two SFs)") {
    Seq(TestSpark.Sf, "/root/testdata/sf0.01").foreach { sf =>
      val full = CdcOps.sessionize(spark, sf).collect().map(_.toSeq).toSet
      val inc = CdcOps.sessionizeIncremental(spark, sf).collect().map(_.toSeq).toSet
      assert(inc === full, sf)
      assert(inc.nonEmpty, sf)
    }
  }

  test("boundary merge and continued numbering on a planted frame") {
    val G = 1800L * 1000000000L // the 30-minute gap in ns
    // midpoint cut = min + (max-min)/2; events at 0 … 10G ⇒ cut = 5G.
    // user 1: base events at 0 and 4.9G (two sessions — gap > G),
    //         delta event at 5.5G (within G of 4.9G ⇒ MERGES into
    //         session 2), delta event at 8G (gap > G ⇒ session 3)
    // user 2: base event at 4G, delta at 7G (gap > G ⇒ session 2)
    // user 3: delta-only events at 6G and 10G (sessions 1 and 2 —
    //         fresh user numbering starts at 1)
    val ev = Seq(
      (1L, 100L, 0L, 1.0),
      (1L, 101L, 49L * G / 10, 2.0),
      (1L, 102L, 55L * G / 10, 3.0),
      (1L, 103L, 8L * G, 4.0),
      (2L, 200L, 4L * G, 5.0),
      (2L, 201L, 7L * G, 6.0),
      (3L, 300L, 6L * G, 7.0),
      (3L, 301L, 10L * G, 8.0))
      .toDF("user_id", "event_id", "ts_ns", "value")
    val out = CdcOps.sessionizeIncrementalFrom(ev)
      .select($"user_id", $"session_id", $"n_events", $"sum_value")
      .as[(Long, Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4))).toMap
    assert(out((1L, 1L)) === ((1L, 1.0)))
    assert(out((1L, 2L)) === ((2L, 5.0)), "the boundary session must MERGE (4.9G + 5.5G)")
    assert(out((1L, 3L)) === ((1L, 4.0)), "numbering continues past the merged session")
    assert(out((2L, 1L)) === ((1L, 5.0)))
    assert(out((2L, 2L)) === ((1L, 6.0)))
    assert(out((3L, 1L)) === ((1L, 7.0)) && out((3L, 2L)) === ((1L, 8.0)),
      "a fresh delta-only user numbers from 1")
    assert(out.size === 7)
  }

  test("the sf0.1 gate corpus really exercises cross-boundary sessions") {
    // sf0.01 happens to have NO session spanning its midpoint cut
    // (measured: 0 there, 3 at sf0.1) — which is exactly why the
    // planted-frame test above exists; the sf0.1 gate covers the
    // merge path on real data
    val sf = "/root/testdata/sf0.1"
    val ev = graft.sources.Tables.events(spark, sf)
    val cutS = ev.agg(expr(
      "CAST((min(ts_ns) + (max(ts_ns) - min(ts_ns)) DIV 2) DIV 1000000000 AS BIGINT)"))
      .as[Long].head()
    val spanning = CdcOps.sessionize(spark, sf)
      .filter($"start_s" <= cutS && $"end_s" > cutS).count()
    assert(spanning > 0,
      s"$sf: no session spans the midpoint cut — the hash gate would " +
        "never test the merge path")
  }
}
