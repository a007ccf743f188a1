package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** q_zorder_skipping is the scan planner's pruning decision run
  * inside the hash gate. Two properties make that audit trustworthy:
  *
  * 1. COMPLETENESS — a stats-based scanner may only skip files whose
  *    min/max box misses the predicate, so every actually-matching
  *    row must live in a touched file. We recompute each query's
  *    matching-file set independently (per layout) and pin touched ⊇
  *    matching — an untouched file holding a hit would be a silently
  *    wrong query result at 100 TB, the worst failure a layout bug
  *    can cause.
  * 2. THE WIN — the reason ZOrder.layout exists: over the probe set,
  *    z-range files touch fewer files and force fewer scanned rows
  *    than leading-column stripes, and both are bounded below by the
  *    perfect-index floor rows_hit.
  */
class ZOrderSkippingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private lazy val audit =
    GeoOps.zorderSkipping(spark, TestSpark.Sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5), r.getLong(6), r.getLong(7), r.getLong(8), r.getLong(9)))

  // the raw grid rows with both file assignments, recomputed here
  private lazy val grid = {
    val g = graft.sources.Tables.customer(spark, TestSpark.Sf)
      .select(pmod(col("c_custkey") * 40503L, lit(1000L)).as("ix"),
        pmod(col("c_custkey") * 69427L, lit(1000L)).as("iy"))
      .withColumn("z", graft.sources.ZOrder.zValue(col("ix"), col("iy")))
      .select(col("ix"), col("iy"),
        shiftright(col("z"), GeoOps.SkipZShift).as("fz"),
        floor(col("ix") / GeoOps.SkipStripe).cast("long").as("fl"))
    g.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
  }

  test("touched files cover every file that holds a matching row, in both layouts") {
    // independent recomputation of per-file stats
    def stats(fileOf: ((Long, Long, Long, Long)) => Long) =
      grid.groupBy(fileOf).map { case (f, rows) =>
        f -> (rows.map(_._1).min, rows.map(_._1).max, rows.map(_._2).min, rows.map(_._2).max, rows.size.toLong)
      }
    val zStats = stats(_._3)
    val lStats = stats(_._4)
    audit.foreach { case (qid, x0, x1, y0, y1, filesZ, rowsZ, filesL, rowsL, hits) =>
      val matching = grid.filter(r => r._1 >= x0 && r._1 <= x1 && r._2 >= y0 && r._2 <= y1)
      assert(matching.size.toLong === hits, s"q$qid rows_hit")
      def touched(st: Map[Long, (Long, Long, Long, Long, Long)]) =
        st.filter { case (_, (mnx, mxx, mny, mxy, _)) =>
          mnx <= x1 && mxx >= x0 && mny <= y1 && mxy >= y0 }
      val (tz, tl) = (touched(zStats), touched(lStats))
      assert(tz.size.toLong === filesZ && tl.size.toLong === filesL, s"q$qid touched-file counts")
      assert(tz.values.map(_._5).sum === rowsZ && tl.values.map(_._5).sum === rowsL,
        s"q$qid scanned-row counts")
      // completeness: no matching row sits in a skipped file
      assert(matching.map(_._3).toSet.subsetOf(tz.keySet), s"q$qid z-layout would drop rows")
      assert(matching.map(_._4).toSet.subsetOf(tl.keySet), s"q$qid stripe layout would drop rows")
    }
  }

  test("z-range files prune strictly better than stripes over the probe set, floored by rows_hit") {
    val (fz, rz) = (audit.map(_._6).sum, audit.map(_._7).sum)
    val (fl, rl) = (audit.map(_._8).sum, audit.map(_._9).sum)
    assert(fz < fl, s"files: z $fz vs stripes $fl")
    assert(rz < rl, s"rows scanned: z $rz vs stripes $rl")
    audit.foreach { case (qid, _, _, _, _, _, rowsZ, _, rowsL, hits) =>
      assert(hits <= rowsZ && hits <= rowsL, s"q$qid stats scan below the perfect-index floor")
    }
  }
}
