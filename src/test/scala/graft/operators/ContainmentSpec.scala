package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Pins [[DedupOps.dedupContainmentFrame]] — the asymmetric
  * excerpt-in-page detector — against a driver-side reference, and the
  * directional semantics Jaccard cannot express: a small doc embedded
  * in a large one must match in exactly one direction.
  */
class ContainmentSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val K = 3

  // limit -1: Spark's split keeps trailing empty tokens
  private def shingleSet(text: String): Set[String] =
    text.split(" ", -1).sliding(K).filter(_.length == K).map(_.mkString(" ")).toSet

  /** Reference mirror: df-capped candidate generation, containment on
    * the FULL shingle sets, round-6 at the output boundary.
    */
  private def reference(docs: Seq[(Long, String)], dfCap: Int,
      thr: Double): Set[(Long, Long, Double)] = {
    val sh = docs.map { case (id, t) => id -> shingleSet(t) }.toMap
    val df = sh.values.flatten.toSeq.groupBy(identity).view.mapValues(_.size)
    val keptOf = sh.view.mapValues(_.filter(s => df(s) <= dfCap)).toMap
    val cand = for {
      (a, sa) <- keptOf.toSeq; (b, sb) <- keptOf.toSeq
      if a < b && sa.exists(sb.contains)
    } yield (a, b)
    cand.flatMap { case (a, b) =>
      val inter = sh(a).intersect(sh(b)).size
      Seq((a, b, inter.toDouble / sh(a).size), (b, a, inter.toDouble / sh(b).size))
    }.filter(_._3 >= thr)
      .map { case (s, d, c) =>
        (s, d, BigDecimal(c).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) }
      .toSet
  }

  private def run(docs: Seq[(Long, String)], dfCap: Int): Set[(Long, Long, Double)] = {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, round}
    DedupOps.dedupContainmentFrame(docs.toDF("doc_id", "text"), dfCap)
      .select(col("src"), col("dst"), round(col("cont"), 6).as("cont"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
  }

  private val vocab = (0 until 40).map(i => s"w$i")
  private def randDoc(rng: scala.util.Random, len: Int): String =
    Seq.fill(len)(vocab(rng.nextInt(vocab.size))).mkString(" ")

  test("an excerpt embedded in a larger page matches in exactly one direction") {
    val rng = new scala.util.Random(5)
    val excerpt = randDoc(rng, 8)
    val page = s"${randDoc(rng, 40)} $excerpt ${randDoc(rng, 40)}"
    val docs = Seq((1L, excerpt), (2L, page))
    val out = run(docs, dfCap = 1000)
    assert(out === reference(docs, 1000, DedupOps.ContainmentThreshold))
    // excerpt→page direction present (all 6 excerpt shingles appear in
    // the page), page→excerpt absent (page is ~10× larger)
    assert(out.exists { case (s, d, c) => s == 1L && d == 2L && c >= 0.8 })
    assert(!out.exists { case (s, d, _) => s == 2L && d == 1L })
  }

  test("matches the reference on a random corpus with planted overlaps") {
    val rng = new scala.util.Random(9)
    val shared = randDoc(rng, 12)
    val docs = (0 until 30).map { i =>
      val body = randDoc(rng, 5 + rng.nextInt(30))
      (i.toLong, if (i % 5 == 0) s"$body $shared" else body)
    }
    assert(run(docs, dfCap = 1000) ===
      reference(docs, 1000, DedupOps.ContainmentThreshold))
  }

  test("df-cap taints resolve by exact verification (hot-shingle corpus)") {
    // a boilerplate phrase hot enough to be dropped from blocking at a
    // tiny cap; pairs still sharing a cool shingle must verify exactly
    val rng = new scala.util.Random(21)
    val boiler = randDoc(rng, 10)
    val tail = randDoc(rng, 6)
    val docs = (0 until 12).map { i =>
      (i.toLong, if (i < 8) s"$boiler $tail" else s"${randDoc(rng, 15)} $boiler")
    }
    val capped = 4 // boiler shingles df = 12 > 4 → dropped from blocking
    assert(run(docs, capped) ===
      reference(docs, capped, DedupOps.ContainmentThreshold))
  }
}
