package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The bucketized point-in-interval join must equal the naive
  * cross-join + BETWEEN filter for every bucket width — width is a
  * performance dial, never a correctness one.
  */
class RangeJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  // deterministic synthetic data with deliberate edge cases: degenerate
  // intervals (lo == hi), spans straddling many buckets, points exactly
  // on bounds, inverted (empty) intervals, negative coordinates
  private def fixtures = {
    import spark.implicits._
    val intervals = Seq(
      (1L, 0L, 100L), (2L, 50L, 50L), (3L, 99L, 4001L), (4L, -250L, -10L),
      (5L, 700L, 650L), // inverted: empty
      (6L, 3999L, 4002L), (7L, -5L, 5L))
      .toDF("iv_id", "lo", "hi")
    val points = Seq(
      (10L, 0L), (11L, 50L), (12L, 100L), (13L, 101L), (14L, 4001L),
      (15L, -10L), (16L, -251L), (17L, 675L), (18L, 5L), (19L, 2048L))
      .toDF("pt_id", "t")
    (points, intervals)
  }

  test("equals the naive BETWEEN join for every bucket width") {
    val (points, intervals) = fixtures
    val naive = points.crossJoin(intervals)
      .filter(col("t") >= col("lo") && col("t") <= col("hi"))
      .select("pt_id", "iv_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(naive.nonEmpty)
    // a degenerate interval and an exact-bound hit must be present
    assert(naive.contains((11L, 2L)) && naive.contains((12L, 1L)))
    // the inverted interval matches nothing
    assert(!naive.exists(_._2 == 5L))
    for (width <- Seq(1L, 7L, 100L, 4096L)) {
      val got = RangeJoin.pointInInterval(points, "t", intervals, "lo", "hi", width)
        .select("pt_id", "iv_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got === naive, s"width $width diverges from the naive join")
    }
  }

  test("emits each qualifying (point, interval) pair exactly once") {
    val (points, intervals) = fixtures
    // width 3 makes interval 3 span ~1300 buckets; the point still has
    // exactly one bucket, so no pair can duplicate
    val rows = RangeJoin.pointInInterval(points, "t", intervals, "lo", "hi", width = 3L)
      .select("pt_id", "iv_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(rows.length === rows.distinct.length)
  }

  test("equi-keys restrict matches to the same key") {
    import spark.implicits._
    val intervals = Seq(("a", 1L, 0L, 100L), ("b", 2L, 0L, 100L))
      .toDF("k", "iv_id", "lo", "hi")
    val points = Seq(("a", 10L, 50L), ("b", 11L, 50L), ("c", 12L, 50L))
      .toDF("k", "pt_id", "t")
    val got = RangeJoin.pointInInterval(points, "t", intervals, "lo", "hi",
        width = 64L, keys = Seq("k"))
      .select("pt_id", "iv_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === Set((10L, 1L), (11L, 2L)))
  }

  test("rejects inputs that already carry the internal bucket column") {
    val (points, intervals) = fixtures
    assertThrows[IllegalArgumentException] {
      RangeJoin.pointInInterval(points.withColumn("_bkt", lit(0L)), "t",
        intervals, "lo", "hi", 10L)
    }
  }

  // interval×interval fixtures: touching endpoints (closed-span share),
  // containment, identical spans, long-vs-short, inverted (empty),
  // negative coordinates, disjoint
  private def overlapFixtures = {
    import spark.implicits._
    val left = Seq(
      (1L, 0L, 100L), (2L, 100L, 200L), (3L, 5000L, 9000L),
      (4L, -300L, -200L), (5L, 40L, 30L) /* inverted: empty */)
      .toDF("a_id", "a_lo", "a_hi")
    val right = Seq(
      (10L, 100L, 150L) /* touches 1 at a point, overlaps 2 */,
      (11L, 0L, 10000L) /* long: covers everything positive */,
      (12L, -250L, -240L), (13L, 300L, 400L), (14L, 20L, 25L),
      (15L, 60L, 50L) /* inverted: empty */)
      .toDF("b_id", "b_lo", "b_hi")
    (left, right)
  }

  test("intervalOverlap equals the naive overlap join for every bucket width") {
    val (left, right) = overlapFixtures
    // the naive reference must itself drop inverted (empty) spans: the
    // raw two-predicate overlap test can "overlap" an empty interval
    val naive = left.filter(col("a_lo") <= col("a_hi"))
      .crossJoin(right.filter(col("b_lo") <= col("b_hi")))
      .filter(col("a_lo") <= col("b_hi") && col("b_lo") <= col("a_hi"))
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // closed spans: the single shared point 100 joins pair (1, 10)
    assert(naive.contains((1L, 10L)) && naive.contains((4L, 12L)))
    assert(!naive.exists(p => p._1 == 5L || p._2 == 15L), "empty intervals match nothing")
    for (width <- Seq(1L, 7L, 100L, 4096L)) {
      val got = RangeJoin.intervalOverlap(left, "a_lo", "a_hi",
          right, "b_lo", "b_hi", width)
        .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got === naive, s"width $width diverges from the naive overlap join")
    }
  }

  test("intervalOverlap emits each overlapping pair exactly once (ownership bucket)") {
    val (left, right) = overlapFixtures
    // width 3: the (3, 11) pair shares ~1300 buckets yet must emit once
    val rows = RangeJoin.intervalOverlap(left, "a_lo", "a_hi",
        right, "b_lo", "b_hi", width = 3L)
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(rows.length === rows.distinct.length)
    assert(rows.contains((3L, 11L)))
  }

  test("overlapSelfPreflight's pair bound equals the actual pre-verify candidate count per bucket") {
    import spark.implicits._
    // a deliberate hot bucket: 5 intervals packed into [0, 9] (plus the
    // usual straddlers/degenerates) — the flash-event shape the
    // pre-flight exists to surface
    val iv = Seq(
      (1L, 0L, 9L), (2L, 1L, 8L), (3L, 2L, 9L), (4L, 0L, 3L), (5L, 5L, 9L),
      (6L, 95L, 210L), (7L, 100L, 100L), (8L, 300L, 250L) /* inverted */)
      .toDF("id", "lo", "hi")
    val width = 100L
    val pf = RangeJoin.overlapSelfPreflight(iv, "lo", "hi", width)
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    // actual candidates: the banded self-join's per-bucket pair rows
    // BEFORE overlap verification and ownership dedup (a.id < b.id —
    // unordered pairs, never self)
    val banded = iv.filter(col("lo") <= col("hi"))
      .select(col("id"), explode(expr(s"sequence(lo DIV $width, hi DIV $width)")).as("bucket"))
    val actual = banded.as("a")
      .join(banded.as("b"), col("a.bucket") === col("b.bucket") && col("a.id") < col("b.id"))
      .groupBy(col("a.bucket")).agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    // every bucket's bound IS the candidate count (zero-pair buckets
    // appear in the pre-flight with bound 0, absent from the join)
    pf.foreach { case (b, (n, bound)) =>
      assert(bound === n * (n - 1) / 2)
      assert(actual.getOrElse(b, 0L) === bound, s"bucket $b")
    }
    assert(actual.keySet.subsetOf(pf.keySet))
    // the hot bucket is visible: 6 intervals touch bucket 0 (the five
    // packed ones plus the 95..210 straddler) → C(6,2) = 15 candidates
    assert(pf(0L) === ((6L, 15L)))
  }

  test("bucketPairBudget is semantics-free below the budget") {
    val (left, right) = overlapFixtures
    for (width <- Seq(7L, 100L)) {
      val exact = RangeJoin.intervalOverlap(left, "a_lo", "a_hi",
          right, "b_lo", "b_hi", width)
        .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      // budget far above any bucket's nL·nR here → identical output
      val budgeted = RangeJoin.intervalOverlap(left, "a_lo", "a_hi",
          right, "b_lo", "b_hi", width, bucketPairBudget = Some(1000000L))
        .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(budgeted === exact, s"width $width: budget changed results below the budget")
    }
  }

  test("bucketPairBudget cuts exactly the overlaps OWNED by an over-budget bucket") {
    import spark.implicits._
    val width = 100L
    // flash event: 5×5 candidate pairs packed into bucket 0 (> budget
    // 20), plus cool-bucket pairs, plus a pair that COLLIDES in the
    // hot bucket but whose overlap STARTS in cool bucket 1 — the
    // ownership rule must keep it
    val a = Seq((1L, 0L, 9L), (2L, 1L, 8L), (3L, 2L, 9L), (4L, 0L, 3L), (5L, 5L, 9L),
      (6L, 50L, 120L), (7L, 300L, 310L)).toDF("a_id", "a_lo", "a_hi")
    val b = Seq((11L, 0L, 9L), (12L, 1L, 8L), (13L, 2L, 9L), (14L, 0L, 3L), (15L, 5L, 9L),
      (16L, 110L, 220L), (17L, 305L, 320L)).toDF("b_id", "b_lo", "b_hi")
    def pairs(budget: Option[Long]) =
      RangeJoin.intervalOverlap(a, "a_lo", "a_hi", b, "b_lo", "b_hi", width,
          bucketPairBudget = budget)
        .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = pairs(None)
    val got = pairs(Some(20L))
    // bucket 0 has nL·nR = 6·5 = 30 > 20 (six a-rows touch it: the five
    // packed plus nothing else — a_id 6 starts at 50, same bucket 0):
    // every overlap starting in bucket 0 is cut
    val ownedByHot = exact.filter { case (ai, bi) => ai <= 6 && bi <= 15 }
    assert(got === exact -- ownedByHot,
      s"expected exactly the hot-owned pairs cut; missing=${(exact -- ownedByHot) -- got} extra=${got -- (exact -- ownedByHot)}")
    // the collide-in-hot-but-owned-by-cool pair survives: a6 [50,120] ×
    // b16 [110,220] overlaps from 110 (bucket 1), both cover bucket 1
    assert(got.contains((6L, 16L)), "pair owned by a cool bucket was wrongly cut")
    // cool bucket 3 untouched
    assert(got.contains((7L, 17L)))
    // bounded: output ≤ exact minus the hot bucket's contribution
    assert(got.size < exact.size)
  }
}
