package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The SCD2 temporal lookup's contracts — the halves the hash oracle
  * cannot demonstrate on its own: lookup(T_fact) must equal the
  * snapshot-at containment rule applied at each fact's own instant
  * (delete/resurrect chains included — a fact inside a key's DEAD
  * interval gets NO version), a fact that is itself a non-delete
  * change sees its OWN version, a delete-fact sees none, and the
  * corpus-wide run preserves fact cardinality exactly (the
  * one-version-per-fact disjointness invariant).
  */
class Scd2LookupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  // (event_id, ts_ns, user_id, op, event_type, value)
  private def feed(rows: Seq[(Long, Long, Long, String, String, Double)]): DataFrame = {
    import spark.implicits._
    rows.toDF("event_id", "ts_ns", "user_id", "op", "event_type", "value")
  }

  // facts probe explicit instants: (event_id, user_id, event_type, ts_ns)
  private def facts(rows: Seq[(Long, Long, String, Long)]): DataFrame = {
    import spark.implicits._
    rows.toDF("event_id", "user_id", "event_type", "ts_ns")
  }

  private def lookup(f: DataFrame, fx: DataFrame): Map[Long, Row] =
    CdcOps.scd2LookupFrom(f, fx).collect().map(r => r.getLong(1) -> r).toMap

  test("delete/resurrect chain: live, dead-gap and resurrected probes per the snapshot rule") {
    // key 1: insert@100 (v1), delete@300, re-insert@500 (v2)
    val f = feed(Seq(
      (1L, 100L, 1L, "c", "signup", 1.0),
      (2L, 300L, 1L, "d", "view", 0.0),
      (3L, 500L, 1L, "u", "view", 2.0)))
    val fx = facts(Seq(
      (10L, 1L, "purchase", 200L), // inside v1
      (11L, 1L, "purchase", 300L), // AT the delete instant → dead ([from, to))
      (12L, 1L, "purchase", 400L), // inside the dead gap
      (13L, 1L, "purchase", 500L), // at the re-insert → v2
      (14L, 1L, "purchase", 50L))) // before any version
    val got = lookup(f, fx)
    assert(got(10L).getLong(4) === 1L && got(10L).getBoolean(8))
    assert(!got(11L).getBoolean(8) && got(11L).isNullAt(4),
      "a fact AT the delete instant sits in the dead interval")
    assert(!got(12L).getBoolean(8) && got(12L).isNullAt(4))
    assert(got(13L).getLong(4) === 3L && got(13L).getBoolean(8))
    assert(!got(14L).getBoolean(8))
    // per-fact equivalence with the snapshot-at containment rule
    val hist = f.withColumn("valid_to_ns",
        lead(col("ts_ns"), 1).over(org.apache.spark.sql.expressions.Window
          .partitionBy(col("user_id")).orderBy(col("ts_ns"), col("event_id"))))
      .filter(col("op") =!= "d")
      .collect().map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(6)) Long.MaxValue else r.getLong(6)))
    fx.collect().foreach { fr =>
      val t = fr.getLong(3)
      val want = hist.filter { case (_, from, to) => from <= t && t < to }
      assert(want.length <= 1, "planted intervals must be disjoint")
      val gotRow = got(fr.getLong(0))
      if (want.isEmpty) assert(!gotRow.getBoolean(8))
      else assert(gotRow.getBoolean(8) && gotRow.getLong(4) === want.head._1)
    }
  }

  test("a non-delete fact sees its OWN version; a delete-fact sees none") {
    val f = feed(Seq(
      (1L, 100L, 7L, "c", "signup", 1.0),
      (2L, 200L, 7L, "u", "view", 2.0),
      (3L, 400L, 7L, "d", "view", 0.0)))
    // the facts ARE the feed rows, probing at their own instants
    val fx = facts(Seq(
      (2L, 7L, "view", 200L), // its own update → its own version
      (3L, 7L, "view", 400L))) // the delete → the interval closed AT it
    val got = lookup(f, fx)
    assert(got(2L).getLong(4) === 2L && got(2L).getBoolean(8))
    assert(!got(3L).getBoolean(8))
  }

  test("corpus run: cardinality preserved, version always contains its fact") {
    val sf = TestSpark.Sf
    val out = CdcOps.scd2Lookup(spark, sf)
    val nFacts = graft.sources.Tables.events(spark, sf).count()
    assert(out.count() === nFacts,
      "one output row per fact — the disjointness invariant")
    // spot-audit: every matched version's valid_from ≤ the fact instant
    assert(out.filter(col("has_version") && col("valid_from_s") > col("fact_s")).count() === 0)
    assert(out.filter(col("has_version")).count() > 0)
    assert(out.filter(!col("has_version")).count() > 0,
      "the ~10% tombstone rate must produce real dead-gap facts")
  }
}
