package graft.operators

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Random-frame fuzz for the incremental sessionization against an
  * INDEPENDENT driver-side reference (a plain Scala walk over the
  * sorted events — not the Spark window logic, so a shared bug cannot
  * hide): for arbitrary event sets the maintained result must equal
  * the full-semantics session table, midpoint cut landing wherever it
  * lands — inside a session, between users, on a tie.
  */
class SessionizeFuzzSpec extends AnyFunSuite {

  private val spark = TestSpark.spark
  import spark.implicits._

  private val G = 1800L * 1000000000L // the 30-minute gap in ns

  private def samples[A](gen: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => gen.apply(Gen.Parameters.default, Seed(313L + i)))

  // events clustered AROUND the gap threshold so merges, exact-gap
  // boundaries and cut-spanning sessions all occur
  private val eventsGen: Gen[Seq[(Long, Long, Long, Double)]] = for {
    n <- Gen.choose(2, 40)
    rows <- Gen.listOfN(n, for {
      u <- Gen.choose(1L, 5L)
      // ts as a multiple of G/8 in [0, 20G]: gaps hit exactly-G and
      // just-over-G shapes, and duplicates force the event_id tiebreak
      tick <- Gen.choose(0L, 160L)
      v <- Gen.choose(0L, 999L)
    } yield (u, tick * (G / 8), v / 100.0))
  } yield rows.zipWithIndex.map { case ((u, ts, v), i) => (u, i.toLong, ts, v) }

  /** The independent reference: sort, walk, cut sessions at gap > G. */
  private def reference(ev: Seq[(Long, Long, Long, Double)])
      : Map[(Long, Long), (Long, Long, Long, Double)] =
    ev.groupBy(_._1).flatMap { case (u, rows) =>
      val sorted = rows.sortBy(r => (r._3, r._2))
      var sid = 0L
      var prev = Long.MinValue
      val sessions = scala.collection.mutable.Map
        .empty[Long, scala.collection.mutable.ArrayBuffer[(Long, Double)]]
      sorted.foreach { case (_, _, ts, v) =>
        if (prev == Long.MinValue || ts - prev > G) sid += 1
        sessions.getOrElseUpdate(sid, scala.collection.mutable.ArrayBuffer.empty)
          .append((ts, v))
        prev = ts
      }
      sessions.map { case (s, xs) =>
        (u, s) -> ((xs.size.toLong, xs.map(_._1).min / 1000000000L,
          xs.map(_._1).max / 1000000000L,
          BigDecimal(xs.map(_._2).sum).setScale(2, BigDecimal.RoundingMode.HALF_UP)
            .toDouble))
      }
    }

  test("incremental ≡ an independent reference on arbitrary event frames") {
    samples(eventsGen, 60).foreach { ev =>
      val df = ev.toDF("user_id", "event_id", "ts_ns", "value")
      val got = CdcOps.sessionizeIncrementalFrom(df)
        .select($"user_id", $"session_id", $"n_events", $"start_s", $"end_s", $"sum_value")
        .as[(Long, Long, Long, Long, Long, Double)].collect()
        .map(r => (r._1, r._2) -> ((r._3, r._4, r._5, r._6))).toMap
      val want = reference(ev)
      assert(got.keySet === want.keySet, s"n=${ev.size}: session set diverged")
      got.foreach { case (k, (n, s, e, v)) =>
        val (wn, ws, we, wv) = want(k)
        assert(n === wn && s === ws && e === we, s"n=${ev.size} session $k")
        assert(math.abs(v - wv) < 1e-9, s"n=${ev.size} session $k sum $v vs $wv")
      }
    }
  }
}
