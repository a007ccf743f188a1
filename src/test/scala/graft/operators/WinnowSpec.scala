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
}
