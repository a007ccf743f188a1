package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions.col

import graft.operators.FuzzyJoin

/** The generic tiered resolver against a hand-built register, checking
  * the reference's preference ladder (halalService.ts:103-177).
  */
class FuzzyJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("tier ladder and aux-key preference") {
    import spark.implicits._
    val merchants = Seq(
      (1L, "Al-Amin Restaurant Pte Ltd", "520159"),
      (2L, "Kopi Corner #03-21", "310127"),
      (3L, "Nasi Padang House Stall 4", "760417")
    ).toDF("id", "name", "postal")
    val register = Seq(
      (10L, "Al-Amin Restaurant", "999999"),     // exact name, wrong postal → tier 2
      (11L, "Al-Amin Restaurant", "520159"),     // exact name + postal   → tier 1 (preferred)
      (12L, "Kopi Corner Express", "310127"),    // similar + postal      → tier 3
      (13L, "Totally Different Shop", "000000")
    ).toDF("rid", "rname", "rpostal")

    val out = FuzzyJoin.resolve(
      merchants, "id", col("name"), col("postal"),
      register, "rid", col("rname"), col("rpostal")).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getInt(2), r.getInt(3))).toMap

    assert(out(1L) === ((11L, 1, 1)))  // postal-confirmed exact beats exact
    assert(out(2L)._1 === 12L)
    assert(out(2L)._2 === 3)           // similarity tier
    assert(!out.contains(3L))          // no match above threshold
  }

  test("threshold below 0.5 is rejected (blocking would lose recall)") {
    import spark.implicits._
    val df = Seq((1L, "a b", "x")).toDF("id", "name", "aux")
    intercept[IllegalArgumentException] {
      FuzzyJoin.resolve(df, "id", col("name"), col("aux"),
        df, "id", col("name"), col("aux"), threshold = 0.3)
    }
  }
}
