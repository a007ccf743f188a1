package graft.operators

import java.security.MessageDigest

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Random-frame fuzz for the incremental curation against an
  * INDEPENDENT driver-side replica of the full pipeline semantics
  * (normalized-text dedup keeping the min id, hash-derived bench
  * drop, per-source top-N capped by quality-then-id, per-language
  * running-sum shard packing) — zero LR weights pin every doc's
  * quality at exactly 0.5, isolating the structural stages so the
  * replica needs no sigmoid-table replication. Sources are sized so
  * the cap BINDS across random cut positions (the insert-only top-N
  * merge and its evictions are exercised, not just passed through).
  */
class CurateFuzzIvmSpec extends AnyFunSuite {

  private val spark = TestSpark.spark
  import spark.implicits._

  private val SourceCap = 20
  private val ShardBudget = 2048L

  private def samples[A](gen: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => gen.apply(Gen.Parameters.default, Seed(733L + i)))

  private def isBench(t: String): Boolean = {
    val d = MessageDigest.getInstance("MD5")
      .digest(t.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    java.lang.Long.parseLong(d.take(4).map("%02x".format(_)).mkString, 16) % 20 == 0
  }

  private case class Doc(id: Long, text: String, source: String, lang: String)

  /** The independent reference: the full pipeline, plainly. */
  private def reference(docs: Seq[Doc]): Set[(Long, String, String, Long, Long, Long, Long)] = {
    val deduped = docs.groupBy(d => d.text.toLowerCase.replaceAll("\\s+", " ").trim)
      .values.map(_.minBy(_.id)).toSeq
    val survivors = deduped.filterNot(d => isBench(d.text)) // p = 0.5 passes; contam empty
    val capped = survivors.groupBy(_.source).values.flatMap { ds =>
      ds.sortBy(_.id).take(SourceCap).zipWithIndex.map { case (d, i) => (d, i + 1L) }
    }.toSeq
    capped.groupBy(_._1.lang).values.flatMap { ds =>
      var cum = 0L
      ds.sortBy(_._1.id).map { case (d, rnk) =>
        val est = (d.text.length + 3) / 4
        cum += est
        (d.id, d.source, d.lang, rnk, est.toLong, cum, (cum - est) / ShardBudget)
      }
    }.toSet
  }

  private val words = Vector("tok", "alpha", "beta", "gamma", "delta", "fine", "words")

  private val frameGen: Gen[Seq[Doc]] = for {
    n <- Gen.choose(20, 70)
    rows <- Gen.listOfN(n, for {
      len <- Gen.choose(2, 10)
      toks <- Gen.listOfN(len, Gen.oneOf(words))
      src <- Gen.oneOf("s1", "s2")       // two sources ⇒ the cap binds often
      lang <- Gen.oneOf("en", "zh")
      dupStyle <- Gen.choose(0, 3)       // some docs normalize-collide
    } yield (dupStyle match {
      case 0 => toks.mkString("  ").toUpperCase // whitespace+case variant
      case _ => toks.mkString(" ")
    }, src, lang))
  } yield rows.zipWithIndex.map { case ((t, s, l), i) => Doc(i.toLong + 1, t, s, l) }

  test("incremental ≡ an independent full-pipeline replica on random frames") {
    samples(frameGen, 15).foreach { docs =>
      val df = docs.map(d => (d.id, d.text, d.source, d.lang, d.text.length))
        .toDF("doc_id", "text", "source", "lang", "n_chars")
      val empty = Seq.empty[Long].toDF("doc_id")
      val got = CorpusOps.curateIncrementalFrom(df, Array(0L, 0L, 0L, 0L), empty)._2
        .select($"doc_id", $"source", $"lang", $"src_rnk", $"est_tokens",
          $"cum_tokens", $"shard")
        .as[(Long, String, String, Long, Long, Long, Long)].collect().toSet
      assert(got === reference(docs), s"n=${docs.size}")
    }
    // the structural stages must all fire somewhere across the sample
    val any = samples(frameGen, 15)
    assert(any.exists(d => d.size > 2 * SourceCap), "cap never bound")
    assert(any.exists(d =>
      d.groupBy(x => x.text.toLowerCase.replaceAll("\\s+", " ").trim).exists(_._2.size > 1)),
      "no normalize-duplicates sampled")
    assert(any.exists(_.exists(d => isBench(d.text))), "no bench docs sampled")
  }
}
