package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class SaltingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("salted join equals the plain join on a pathologically skewed key") {
    import spark.implicits._
    // 90% of the fact rows share one key — the classic straggler shape
    val fact = (1 to 10000).map { i =>
      val k = if (i % 10 == 0) s"k${i % 100}" else "hot"
      (i.toLong, k, i * 1.5)
    }.toDF("row_id", "k", "v")
    val dim = (Seq("hot") ++ (0 until 100).map(i => s"k$i")).zipWithIndex
      .map { case (k, i) => (k, s"label_$i") }.toDF("k", "label")

    val plain = fact.join(dim, "k")
      .select($"row_id", $"label").as[(Long, String)].collect().toSet
    val salted = Salting.saltedJoin(fact, dim, "k", col("row_id"), buckets = 8)
      .select($"row_id", $"label").as[(Long, String)].collect().toSet
    assert(salted === plain)
    assert(plain.size === 10000)
  }

  test("inputs already carrying a _salt column survive intact") {
    import spark.implicits._
    // `_salt` here is USER data: the join must neither overwrite it
    // nor let it collide with the internal salting column
    val fact = (1 to 100).map(i => (i.toLong, "k", s"user_salt_$i")).toDF("row_id", "k", "_salt")
    val dim = Seq(("k", "lbl")).toDF("k", "label")
    val out = Salting.saltedJoin(fact, dim, "k", col("row_id"), buckets = 4)
    assert(out.count() === 100)
    assert(out.columns.contains("_salt"))
    assert(out.select("_salt").as[String].collect().toSet ===
      (1 to 100).map(i => s"user_salt_$i").toSet)
  }

  test("the hot key's fact rows spread across all salt buckets") {
    import spark.implicits._
    val fact = (1 to 1000).map(i => (i.toLong, "hot", 1.0)).toDF("row_id", "k", "v")
    val spread = fact
      .withColumn("_salt", pmod(hash(col("row_id")), lit(8)))
      .groupBy("_salt").count().collect()
    assert(spread.length === 8) // every bucket populated
    assert(spread.map(_.getLong(1)).max < 1000 * 0.3) // no bucket dominates
  }
}
