package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Semantics guards for the round-4 curation additions: PII
  * redaction, cross-document boilerplate, token-budget shard packing.
  */
class CurationOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.01"

  test("pii redaction: every decorated row is found and fully scrubbed") {
    import spark.implicits._
    val rows = PiiOps.piiRedact(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_emails") === 1L)
      assert(r.getAs[Long]("n_phones") === 1L)
      assert(r.getAs[Long]("n_ids") === 1L)
      assert(r.getAs[Long]("n_ips") === 1L)
      val red = r.getAs[String]("redacted")
      assert(red.contains("<EMAIL>") && red.contains("<PHONE>") &&
        red.contains("<ID>") && red.contains("<IP>"))
      // nothing matching the detectors survives in the redacted text
      assert(!red.contains("@"))
      assert(!red.matches(".*\\+[0-9]{2} [0-9]{7,8}.*"))
      assert(!red.matches(".*[STFG][0-9]{7}[A-Z].*"))
      assert(!red.matches(".*[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}.*"))
      // Luhn gate: the even-key card is valid and scrubbed; the
      // odd-key 16-digit lookalike fails the checksum and SURVIVES
      // (a blanket digit-run scrub would destroy non-PII text)
      val key = r.getAs[Long]("c_custkey")
      if (key % 2 == 0) {
        assert(r.getAs[Long]("n_cards") === 1L, s"key $key")
        assert(red.contains("<CARD>") && !red.matches(".*[0-9]{16}.*"))
      } else {
        assert(r.getAs[Long]("n_cards") === 0L, s"key $key")
        assert(!red.contains("<CARD>") && red.matches(".*[0-9]{16}.*"))
      }
    }
  }

  test("pii: Luhn fold accepts known-valid and rejects perturbed card numbers") {
    import spark.implicits._
    // 4539578763621486 is Luhn-valid (standard test number); any
    // single-digit perturbation of the check digit must fail
    val cards = Seq("4539578763621486" -> true, "4539578763621487" -> false,
      "4539578763621485" -> false, "0000000000000000" -> true).toDF("card", "want")
    val got = cards.select(col("want"), PiiOps.luhnOk(col("card")).as("ok")).collect()
    got.foreach(r => assert(r.getBoolean(0) === r.getBoolean(1), r.toString))
  }

  test("boilerplate: shared shingles flagged on both sides, unique docs score zero") {
    import spark.implicits._
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"), // shares 5-gram prefix with 2
      (2L, "alpha beta gamma delta epsilon eta"),
      (3L, "one two three four five six seven"), // unique
      (4L, "tiny doc") // < 5 tokens → no shingles → absent
    ).toDF("doc_id", "text")
    // drive the same frame shape through the operator's core
    val grams = docs.select(col("doc_id"),
      explode(array_distinct(graft.functions.Hashing.shingles(split(col("text"), " "), 5))).as("g"))
    val df = grams.groupBy("g").agg(count(lit(1)).as("df"))
    val out = grams.join(df, "g").groupBy("doc_id")
      .agg(count(lit(1)).as("n_shingles"),
        sum(when(col("df") >= 2, 1L).otherwise(0L)).as("n_boiler"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out(1L) === ((2L, 1L))) // "alpha beta gamma delta epsilon" shared
    assert(out(2L) === ((2L, 1L)))
    assert(out(3L) === ((3L, 0L)))
    assert(!out.contains(4L))

    // real corpus: fractions well-formed and some boilerplate exists
    val real = TextOps.boilerplate(spark, sf).collect()
    assert(real.nonEmpty)
    real.foreach { r =>
      val frac = r.getAs[Double]("boiler_frac")
      assert(frac >= 0.0 && frac <= 1.0)
      assert(r.getAs[Long]("n_boiler") <= r.getAs[Long]("n_shingles"))
    }
    assert(real.exists(_.getAs[Long]("n_boiler") > 0))
  }

  test("range-bucketed packing is bit-identical to the single-window layout") {
    // sortBy: the layouts carry no presentation orderBy (the driver's
    // checker row-sorts; so does this spec)
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("lang"),
        r.getAs[Long]("est_tokens"), r.getAs[Long]("cum_tokens"),
        r.getAs[Long]("shard"))).toSeq.sortBy(_._1)
    val ref = rows(CorpusOps.packShardsSingleWindow(spark, sf))
    assert(ref.nonEmpty)
    // widths chosen to force many buckets (incl. a non-divisor odd
    // width, so bucket boundaries fall mid-shard and mid-language)
    for (width <- Seq(7L, 16L, 256L))
      assert(rows(CorpusOps.packShardsBucketed(spark, sf, width)) === ref,
        s"bucket width $width diverges from the single-window reference")
  }

  test("bucketed per-source cap is bit-identical to the single-window top-N") {
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("doc_id"),
        r.getAs[Double]("quality"), r.getAs[Long]("rnk"))).toSeq
    val ref = rows(CorpusOps.sourceCapSingleWindow(spark, sf))
    assert(ref.nonEmpty)
    // the cap must actually bite (some docs dropped), and every kept
    // rank run is 1..n ≤ cap per source
    ref.groupBy(_._1).foreach { case (_, docs) =>
      assert(docs.map(_._4).sorted === (1L to docs.length))
      assert(docs.length <= 20)
    }
    for (width <- Seq(7L, 64L, 256L))
      assert(rows(CorpusOps.sourceCapBucketed(spark, sf, width)) === ref,
        s"bucket width $width diverges from the single-window reference")
  }

  test("pack shards: monotone within language, budget respected at shard starts") {
    val rows = CorpusOps.packShards(spark, sf).collect()
      .map(r => (r.getAs[String]("lang"), r.getAs[Long]("doc_id"),
        r.getAs[Long]("est_tokens"), r.getAs[Long]("cum_tokens"), r.getAs[Long]("shard")))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (_, docs) =>
      val inOrder = docs.sortBy(_._2)
      // running sum is consistent and shard ids never decrease
      var cum = 0L
      var prevShard = -1L
      inOrder.foreach { case (_, _, est, cumTok, shard) =>
        cum += est
        assert(cumTok === cum)
        assert(shard === (cumTok - est) / 2048)
        assert(shard >= prevShard)
        prevShard = shard
      }
      // a doc is in shard k iff it STARTS inside k's budget window —
      // the property that makes the layout reproducible
      inOrder.foreach { case (_, _, est, cumTok, shard) =>
        val start = cumTok - est
        assert(start >= shard * 2048 && start < (shard + 1) * 2048)
      }
      // the corpus is big enough that packing actually splits it
      assert(inOrder.map(_._5).distinct.length >= 2)
    }
  }
}
