package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The transactionally-consistent multi-table snapshot's contracts —
  * the halves the hash oracle cannot demonstrate: the PLANTED STRADDLE
  * (a parent update before the shared cut plus a child insert after it
  * must not surface the child, while the fractured-read join a naive
  * consumer performs DOES surface it — the bug the shared watermark
  * exists to prevent), orphan accounting under a tombstoned parent,
  * childless parents, resurrection across the cut boundary, and the
  * full-corpus statuses being non-degenerate.
  */
class CdcTxnSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  // (event_id, ts_ns, user_id, op, event_type, value)
  private def feed(rows: Seq[(Long, Long, Long, String, String, Double)]): DataFrame = {
    import spark.implicits._
    rows.toDF("event_id", "ts_ns", "user_id", "op", "event_type", "value")
  }

  private def snap(f: DataFrame): Map[(Long, Option[String]), org.apache.spark.sql.Row] =
    CdcOps.txnSnapshotFrom(f).collect()
      .map(r => (r.getLong(0), Option(r.getString(1))) -> r).toMap

  test("the planted straddle: a child insert past the cut is invisible; the naive join shows it") {
    // ts range 0..1000 → shared cut at 500. Parent u1 updates at 100
    // (before the cut); its child line 'click' INSERTS at 900 (after).
    val f = feed(Seq(
      (1L, 0L, 9L, "c", "signup", 1.0), // range anchors
      (2L, 1000L, 9L, "u", "view", 2.0),
      (3L, 100L, 1L, "u", "view", 5.0), // parent-visible update ≤ cut
      (4L, 900L, 1L, "c", "click", 7.0))) // child line born AFTER the cut
    val s = snap(f)
    // u1's 'click' child line must NOT exist at the cut — its only
    // change is past the watermark
    assert(!s.contains((1L, Some("click"))),
      "a child change past the shared cut leaked into the snapshot")
    // u1 is present with its ≤-cut state ('view' line under a live parent)
    val r = s((1L, Some("view")))
    assert(r.getString(7) === "ok" && r.getBoolean(8))
    assert(r.getLong(4) === 3L, "parent version must be the ≤-cut change")
    // THE COUNTEREXAMPLE: per-table latest WITHOUT the shared cut —
    // parent cut at the watermark, child table read to the feed's head
    // (the fractured read) — happily serves the phantom child line
    val cutP = f.crossJoin(graft.operators.Ivm.midpointCutOn(f, "ts_ns", "k"))
      .filter(col("ts_ns") <= col("k"))
    val naiveChild = f // un-cut child table
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("user_id"), col("event_type"))
          .orderBy(col("ts_ns").desc, col("event_id").desc)))
      .filter(col("rn") === 1 && col("op") =!= "d")
    val naiveParent = cutP
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("user_id"))
          .orderBy(col("ts_ns").desc, col("event_id").desc)))
      .filter(col("rn") === 1 && col("op") =!= "d")
    val fractured = naiveParent.select(col("user_id"))
      .join(naiveChild.select(col("user_id"), col("event_type")), "user_id")
      .filter(col("user_id") === 1L && col("event_type") === "click")
    assert(fractured.count() === 1L,
      "the naive fractured read should surface the phantom child (that is the bug)")
  }

  test("a tombstoned parent orphans exactly its surviving child lines") {
    // u2: 'view' line at 100, then the parent's newest ≤-cut change is
    // a tombstone at 200 → parent gone, the view line becomes orphaned
    val f = feed(Seq(
      (1L, 0L, 9L, "c", "signup", 1.0),
      (2L, 1000L, 9L, "u", "view", 2.0),
      (3L, 100L, 2L, "u", "view", 5.0),
      (4L, 200L, 2L, "d", "purchase", 0.0)))
    val s = snap(f)
    val orphan = s((2L, Some("view")))
    assert(orphan.getString(7) === "orphaned" && !orphan.getBoolean(8))
    assert(orphan.isNullAt(4), "an orphan carries no parent version")
    // the tombstoned line itself is absent (its newest change is the delete)
    assert(!s.contains((2L, Some("purchase"))))
  }

  test("a live parent whose child lines are all tombstoned is childless, served") {
    val f = feed(Seq(
      (1L, 0L, 9L, "c", "signup", 1.0),
      (2L, 1000L, 9L, "u", "view", 2.0),
      (3L, 100L, 3L, "d", "view", 5.0), // the only line: tombstoned
      (4L, 200L, 3L, "u", "view", 6.0), // resurrected...
      (5L, 300L, 3L, "d", "view", 0.0))) // ...and re-tombstoned ≤ cut
    // parent u3's newest ≤-cut change is the delete → parent is gone too:
    // orphan-free absence. Make the parent live via a second line.
    val f2 = f.unionByName(feed(Seq((6L, 400L, 3L, "u", "purchase", 9.0))))
    val s = snap(f2)
    val row = s((3L, Some("purchase")))
    assert(row.getString(7) === "ok")
    assert(!s.contains((3L, Some("view"))), "a tombstoned child line must not serve")
    // and a parent with EVERY line tombstoned except its own head:
    val f3 = feed(Seq(
      (1L, 0L, 9L, "c", "signup", 1.0),
      (2L, 1000L, 9L, "u", "view", 2.0),
      (3L, 100L, 4L, "u", "view", 5.0),
      (4L, 200L, 4L, "d", "view", 0.0))) // newest u4 change: delete of the line
    // newest change of user 4 overall IS the tombstone → parent absent,
    // and the view line is tombstoned too → user 4 nowhere
    val s3 = snap(f3)
    assert(!s3.keys.exists(_._1 == 4L))
  }

  test("statuses on the real corpus: all three occur and served ⇔ parent present") {
    val df = CdcOps.cdcTxnSnapshot(spark, TestSpark.Sf)
    val rows = df.collect()
    val statuses = rows.map(_.getString(7)).toSet
    assert(statuses.contains("ok"))
    assert(statuses.contains("orphaned"), "the ~10% tombstone rate should orphan someone")
    rows.foreach { r =>
      assert(r.getBoolean(8) === !r.isNullAt(4))
      if (r.getString(7) == "ok") assert(!r.isNullAt(1) && !r.isNullAt(4))
      if (r.getString(7) == "orphaned") assert(r.isNullAt(4) && !r.isNullAt(1))
      if (r.getString(7) == "childless") assert(r.isNullAt(1) && !r.isNullAt(4))
    }
    // consistency: every served child's parent version is the same for
    // all lines of that parent (ONE cut, one parent version per user)
    val perUser = rows.filter(_.getString(7) == "ok")
      .groupBy(_.getLong(0)).values
    perUser.foreach { g =>
      assert(g.map(_.getLong(4)).toSet.size === 1,
        "a user's child lines must all see one parent version")
    }
  }
}
