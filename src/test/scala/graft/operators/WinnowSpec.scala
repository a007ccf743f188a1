package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The winnowing selector's structural guarantee (Schleimer et al.
  * 2003): any shared substring of length ≥ k + w − 1 contains a full
  * common k-gram hash window on both sides, so its window-min is a
  * SHARED selected fingerprint — detection of long pasted passages is
  * deterministic, not probabilistic.
  */
class WinnowSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  // package-private core re-exposed through the registered query over
  // a synthetic frame: build the same pipeline on controlled docs
  private def pairsOf(docs: Seq[(Long, String)]) = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("winnow").toString
    docs.toDF("doc_id", "text").write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    DedupOps.winnowDedup(spark, dir).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
  }

  private val passage =
    "the seventeen quick brown foxes jumped over the lazy dog while nobody watched them closely"

  test("a planted shared passage is detected; unrelated docs are not paired") {
    val filler1 = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu nu xi"
    val filler2 = "ocean river mountain valley desert forest tundra plain canyon plateau ridge"
    val filler3 = "zero one two three four five six seven eight nine ten eleven twelve thirteen"
    val pairs = pairsOf(Seq(
      (1L, s"$filler1 $passage $filler1"),
      (2L, s"$filler2 $passage extended differently $filler2"),
      (3L, filler3 + " " + filler3)))
    assert(pairs.contains((1L, 2L)), s"planted passage missed: $pairs")
    // the passage spans many windows → well past the 2-fingerprint bar
    assert(pairs((1L, 2L)) >= 2L)
    assert(!pairs.keySet.exists(p => p._1 == 3L || p._2 == 3L),
      s"unrelated doc paired: $pairs")
  }

  test("the k + w - 1 guarantee: a shared span of exactly that length yields a shared fingerprint") {
    val guarantee = DedupOps.WinnowK + DedupOps.WinnowW - 1
    val span = passage.take(guarantee)
    assert(span.length === guarantee)
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("winnow").toString
    Seq(
      (1L, s"prefix entirely unlike anything $span"),
      (2L, s"$span suffix that shares nothing else at all"))
      .toDF("doc_id", "text").write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    // MinShared = 2 filters singles, so check the pre-threshold shared
    // count through the fingerprint pipeline directly: both docs must
    // select ≥ 1 identical fingerprint from the shared span
    val d = spark.read.parquet(s"$dir/documents.parquet")
    val g = d.withColumn("g",
      transform(sequence(lit(1), length(col("text")) - (DedupOps.WinnowK - 1)),
        i => md5(col("text").substr(i, lit(DedupOps.WinnowK)).cast("binary"))))
    val fp = g.withColumn("fp", array_distinct(transform(
        sequence(lit(1), size(col("g")) - (DedupOps.WinnowW - 1)),
        j => array_min(slice(col("g"), j, lit(DedupOps.WinnowW))))))
      .select(col("doc_id"), explode(col("fp")).as("s"))
    val shared = fp.groupBy("s").agg(countDistinct(col("doc_id")).as("nd"))
      .filter(col("nd") === 2).count()
    assert(shared >= 1L, "guarantee violated: no shared fingerprint from the shared span")
  }

  test("native WinnowFingerprintsExpr ≡ the HOF formulation, bit for bit (incl. multi-byte UTF-8)") {
    // the codegen'd expression replaced the interpreted HOF pipeline
    // (r12: 615 s of plan cost at sf0.1); this pins that the native
    // selector produces EXACTLY the distinct fingerprint set of
    // md5(substr) grams + array_min window slices — on ASCII, on
    // multi-byte chars (substr counts code points, md5 hashes UTF-8
    // bytes), and at the minLen boundary
    import spark.implicits._
    val k = DedupOps.WinnowK
    val w = DedupOps.WinnowW
    val docs = Seq(
      1L -> s"$passage and then $passage again with a tail",
      2L -> ("café naïve résumé 你好世界 " * 6 + "end of the multibyte document"),
      3L -> passage.take(k + w - 1), // exactly one window
      4L -> ("x" * 200), // degenerate: all grams identical → one fingerprint
      5L -> passage)
    val df = docs.toDF("doc_id", "text").filter(length(col("text")) >= k + w - 1)
    val hof = df.withColumn("g",
        transform(sequence(lit(1), length(col("text")) - (k - 1)),
          i => md5(col("text").substr(i, lit(k)).cast("binary"))))
      .withColumn("fp", array_distinct(transform(
        sequence(lit(1), size(col("g")) - (w - 1)),
        j => array_min(slice(col("g"), j, lit(w))))))
      .select(col("doc_id"), col("fp"))
    val native = df.select(col("doc_id"),
      graft.plans.TextExpressions.winnowFingerprintsNative(col("text"), k, w).as("fp"))
    val h = hof.collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    val n = native.collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(n.keySet === h.keySet)
    for (id <- h.keySet)
      assert(n(id) === h(id), s"doc $id fingerprints diverge")
    assert(h(3L).size === 1 && h(4L).size === 1)
  }

  test("preflight pair bound ≡ the actual candidate rows of the pair join, kept and dropped accounted") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("winnow").toString
    val fill = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"
    // 6 docs sharing the passage → a fingerprint df of 6 each; plus
    // singles. Cap is WinnowDfCap=200 so all kept here; the dropped
    // side is exercised through the frame entry with a tiny cap.
    val docs = (1L to 6L).map(i => (i, s"$fill $passage tail nr $i")) :+
      (7L, fill + " " + fill.reverse)
    docs.toDF("doc_id", "text").write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    val pre = DedupOps.winnowPreflight(spark, dir).collect()
    val keptBound = pre.filter(_.getBoolean(1)).map(_.getLong(4)).sum
    // actual pre-aggregation join rows on the same kept postings
    val d = spark.read.parquet(s"$dir/documents.parquet")
    val fp = d.filter(length(col("text")) >= DedupOps.WinnowK + DedupOps.WinnowW - 1)
      .select(col("doc_id").as("k"),
        explode(graft.plans.TextExpressions.winnowFingerprintsNative(
          col("text"), DedupOps.WinnowK, DedupOps.WinnowW)).as("s"))
    val dfs = fp.groupBy("s").agg(count(lit(1)).as("df"))
    val kept = fp.join(dfs.filter(col("df") > DedupOps.WinnowDfCap).select("s"),
      Seq("s"), "left_anti")
    val actual = kept.as("a").join(kept.as("b"),
      col("a.s") === col("b.s") && col("a.k") < col("b.k")).count()
    assert(keptBound === actual,
      s"kept pair bound $keptBound != actual candidate rows $actual")
    // band bookkeeping: every fingerprint is in exactly one (band, kept) row
    val nFp = pre.map(_.getLong(2)).sum
    assert(nFp === dfs.count())
    // postings conservation: sum(df) over bands = total postings
    assert(pre.map(_.getLong(3)).sum === fp.count())
  }
}
