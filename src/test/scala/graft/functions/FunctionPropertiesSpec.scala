package graft.functions

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Property tests for the core column functions: invariants that hold
  * for ALL inputs, not just the shipped corpus — the class of bug the
  * oracle gate cannot catch (both engines agreeing on a violated
  * invariant still hash-matches).
  */
class FunctionPropertiesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** Deterministic manual sampling (no scalatest-scalacheck bridge in
    * the offline cache): fixed seed, n cases per property.
    */
  private def samples[A](gen: Gen[A], n: Int = 200): Seq[A] =
    (0 until n).flatMap(i => gen.apply(Gen.Parameters.default, Seed(7L + i)))

  private val nameGen: Gen[String] = for {
    words <- Gen.listOfN(4, Gen.oneOf(
      "Ah", "Hock", "KITCHEN", "café", "Pte", "Ltd", "stall 3", "#01-22",
      "nasi-lemak", "Mdm", "2000", "  ", "&", "UNIT 7a", "Sdn", "Bhd", "李记"))
  } yield words.mkString(" ")

  test("cleanName is idempotent: clean(clean(x)) = clean(x) for arbitrary names") {
    import spark.implicits._
    val df = samples(nameGen).toDF("raw")
      .withColumn("once", Text.cleanName(col("raw")))
      .withColumn("twice", Text.cleanName(Text.cleanName(col("raw"))))
    assert(df.filter(col("once") =!= col("twice")).count() === 0)
  }

  test("cleanName output alphabet: lowercase alphanumerics and single spaces, trimmed") {
    import spark.implicits._
    val out = samples(nameGen).toDF("raw")
      .select(Text.cleanName(col("raw")).as("c")).as[String].collect()
    out.foreach { c =>
      assert(c.matches("|[a-z0-9]+( [a-z0-9]+)*"), s"bad alphabet/spacing: '$c'")
    }
  }

  test("haversine is symmetric, non-negative, zero at identity, bounded by half circumference") {
    import spark.implicits._
    val coordGen = for {
      lat1 <- Gen.choose(-89.0, 89.0); lon1 <- Gen.choose(-179.0, 179.0)
      lat2 <- Gen.choose(-89.0, 89.0); lon2 <- Gen.choose(-179.0, 179.0)
    } yield (lat1, lon1, lat2, lon2)
    val df = samples(coordGen).toDF("la1", "lo1", "la2", "lo2")
      .withColumn("ab", Geo.haversineKm(col("la1"), col("lo1"), col("la2"), col("lo2")))
      .withColumn("ba", Geo.haversineKm(col("la2"), col("lo2"), col("la1"), col("lo1")))
      .withColumn("self", Geo.haversineKm(col("la1"), col("lo1"), col("la1"), col("lo1")))
    val rows = df.select("ab", "ba", "self").collect()
    rows.foreach { r =>
      val (ab, ba, self) = (r.getDouble(0), r.getDouble(1), r.getDouble(2))
      assert(math.abs(ab - ba) < 1e-9, s"asymmetric: $ab vs $ba")
      assert(ab >= 0.0)
      assert(ab <= 20038.0, s"longer than half the circumference: $ab") // π·R, R=6371
      assert(self < 1e-9, s"nonzero self-distance: $self")
    }
  }

  test("z-value interleaving preserves locality ordering on each axis slice") {
    import spark.implicits._
    // along one axis with the other fixed, z-order must be monotone —
    // the property that makes z-range scans prune
    val df = (0 until 1024).map(i => (i, 37)).toDF("x", "y")
      .withColumn("z", graft.sources.ZOrder.zValue(col("x"), col("y")))
      .orderBy("x")
    val zs = df.select("z").as[Long].collect()
    assert(zs.length === 1024)
    zs.sliding(2).foreach { case Array(a, b) => assert(a < b, s"z not monotone: $a !< $b") }
  }

  test("shingle count: |shingles(text)| = max(0, tokens - 2) distinct-capped, for arbitrary texts") {
    import spark.implicits._
    val textGen = Gen.listOfN(12, Gen.oneOf("a", "b", "c", "dd", "ee")).map(_.mkString(" "))
    val rows = samples(textGen).toDF("text")
      .select(col("text"), graft.operators.DedupOps.shingleSet(col("text")).as("sh"))
      .collect()
    rows.foreach { r =>
      val toks = r.getString(0).split(" ").filter(_.nonEmpty)
      val expected = (0 to math.max(0, toks.length - 3))
        .map(i => toks.slice(i, i + 3).mkString(" ")).distinct.size
      assert(r.getSeq[String](1).size === expected, s"text '${r.getString(0)}'")
    }
  }
}
