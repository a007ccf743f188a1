package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The bloom prefilter must be one-sided: every true member passes
  * (no false negatives — the property that makes bloom + exact join
  * semantics-preserving), false positives stay near the design rate,
  * and the accelerated semi join equals the plain one on real tables.
  */
class BloomFilterSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val MBits = 1 << 14 // 16384 bits, 256 words
  private val K = 5

  test("no false negatives: every build key passes mightContain") {
    val build = spark.range(0, 1000).select((col("id") * 37 + 11).as("key"))
    val bitmap = BloomFilter.buildBits(build, "key", MBits, K)
    val missed = BloomFilter.prune(build.select(col("key")), "key", bitmap, MBits, K)
    assert(missed.count() === 1000L, "a member was wrongly pruned")
  }

  test("false-positive rate stays near the design rate") {
    val build = spark.range(0, 1000).select(col("id").as("key"))
    val bitmap = BloomFilter.buildBits(build, "key", MBits, K)
    // 10k keys guaranteed disjoint from the build range
    val nonMembers = spark.range(1000000, 1010000).select(col("id").as("key"))
    val fp = BloomFilter.prune(nonMembers, "key", bitmap, MBits, K).count()
    // n=1000, m=16384, k=5 → theoretical FPR ≈ (1 - e^{-kn/m})^k ≈ 0.22%
    val fpr = fp / 10000.0
    assert(fpr < 0.02, s"false-positive rate $fpr far above the ~0.0022 design rate")
  }

  test("bloom semi join equals the plain semi join on customer⋉orders (sf0.001)") {
    val dir = graft.TestSpark.Sf
    val customer = graft.sources.Tables.customer(spark, dir)
    val orders = graft.sources.Tables.orders(spark, dir)
    val plain = customer.join(orders.select(col("o_custkey")),
        col("c_custkey") === col("o_custkey"), "left_semi")
      .select("c_custkey").collect().map(_.getLong(0)).toSet
    val bloomed = BloomFilter.semiJoin(customer, "c_custkey", orders, "o_custkey")
      .select("c_custkey").collect().map(_.getLong(0)).toSet
    assert(bloomed === plain)
    assert(plain.nonEmpty)
  }

  test("semiJoin works when probe and build share the key NAME") {
    import spark.implicits._
    val probe = spark.range(0, 500).select(col("id").as("key"))
    val build = spark.range(0, 1000, 4).select(col("id").as("key"))
    val got = BloomFilter.semiJoin(probe, "key", build, "key", MBits, K)
      .as[Long].collect().sorted
    val want = probe.join(build, Seq("key"), "left_semi").as[Long].collect().sorted
    assert(got.toSeq === want.toSeq)
  }

  test("bitmap words build deterministically and merge by bit_or across shards") {
    import spark.implicits._
    val all = spark.range(0, 4000).select(col("id").as("key"))
    def words(df: org.apache.spark.sql.DataFrame) =
      BloomFilter.buildBits(df, "key", MBits, K)
        .select(posexplode(col("bits"))).as[(Int, Long)].collect().toMap
    val whole = words(all)
    val a = words(all.filter(col("key") % 2 === 0))
    val b = words(all.filter(col("key") % 2 =!= 0))
    val merged = whole.keys.map(w => w -> (a(w) | b(w))).toMap
    assert(merged === whole)
  }
}
