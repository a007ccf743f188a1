package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.operators.BpeTrainer.Merge

/** BPE training contracts: the distributed greedy loop must equal an
  * independent driver-side reference (same argmax, same tie-break,
  * same stop rule) merge for merge; the apply semantics are the
  * standard left-to-right no-rescan order; encoding round-trips.
  */
class BpeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** Independent reference trainer over word counts. */
  private def referenceTrain(words: Seq[(String, Long)], nMerges: Int): Seq[Merge] = {
    var state = words.map { case (w, n) =>
      (w.codePoints().toArray.toSeq.map(cp => new String(Character.toChars(cp))), n)
    }
    val out = Seq.newBuilder[Merge]
    var rank = 0
    var continue = true
    while (rank < nMerges && continue) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      state.foreach { case (syms, n) =>
        syms.zip(syms.drop(1)).foreach(p => counts(p) = counts.getOrElse(p, 0L) + n)
      }
      val eligible = counts.filter(_._2 >= 2)
      if (eligible.isEmpty) continue = false
      else {
        // argmax: count desc, then the "a b" pair string ascending —
        // the exact distributed tie-break
        val ((a, b), c) = eligible.toSeq
          .sortBy { case ((a, b), c) => (-c, a + " " + b) }.head
        out += Merge(rank, a, b, c)
        state = state.map { case (syms, n) =>
          val merged = Seq.newBuilder[String]
          var i = 0
          while (i < syms.length) {
            if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
              merged += a + b; i += 2
            } else { merged += syms(i); i += 1 }
          }
          (merged.result(), n)
        }
        rank += 1
      }
    }
    out.result()
  }

  private def trainOn(docs: Seq[String], nMerges: Int): (Seq[Merge], Seq[Merge]) = {
    import spark.implicits._
    val df = docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val wc = BpeTrainer.wordCounts(df)
    val got = BpeTrainer.train(spark, wc, nMerges)
    val ref = referenceTrain(
      wc.collect().map(r => r.getString(0) -> r.getLong(1)).toSeq, nMerges)
    (got, ref)
  }

  test("the classic corpus learns the expected first merges") {
    val (got, _) = trainOn(Seq("low low low low lower lower lowest"), 4)
    // 'l o' appears in every word (7 occurrences), then 'lo w'
    assert(got.head.a === "l" && got.head.b === "o" && got.head.count === 7L)
    assert(got(1).a === "lo" && got(1).b === "w" && got(1).count === 7L)
  }

  test("distributed training equals the reference implementation, merge for merge") {
    val docs = Seq(
      "the cat sat on the mat with another cat and the hat",
      "bananas and ananas in a cabana", "deterministic deterministic determinism")
    val (got, ref) = trainOn(docs, 12)
    assert(got === ref)
    assert(got.nonEmpty)
  }

  test("distributed training equals the reference on the real corpus") {
    val wc = BpeTrainer.wordCounts(
      graft.sources.Tables.documents(spark, TestSpark.Sf).select("doc_id", "text"))
    val got = BpeTrainer.train(spark, wc, 20)
    val ref = referenceTrain(
      wc.collect().map(r => r.getString(0) -> r.getLong(1)).toSeq, 20)
    assert(got === ref)
    assert(got.size === 20, "the real corpus supports at least 20 merges")
  }

  test("apply semantics: left-to-right, no rescan of the merged token") {
    import org.apache.spark.unsafe.types.UTF8String
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    val arr = new GenericArrayData(
      Array[AnyRef](UTF8String.fromString("a"), UTF8String.fromString("a"),
        UTF8String.fromString("a")))
    val merged = BpeTrainer.mergePairCompute(arr,
      UTF8String.fromString("a"), UTF8String.fromString("a"))
    assert(merged.numElements() === 2)
    assert(merged.getUTF8String(0).toString === "aa")
    assert(merged.getUTF8String(1).toString === "a")
    // and the driver-side encoder agrees
    assert(BpeTrainer.encodeWord("aaa", Seq(Merge(0, "a", "a", 2))) === Seq("aa", "a"))
  }

  test("the oracle's list_reduce fold is element-for-element the trainer's merge pass") {
    // the q_bpe_* DuckDB oracles apply each merge as
    //   list_reduce(toks, (acc, x) -> if last(acc)==a && x==b
    //                                 then init(acc) :+ (a+b) else acc :+ x)
    // — this replica proves the fold equals mergePairCompute's
    // left-to-right no-rescan pass on adversarial shapes (runs of the
    // same symbol, merged-token-as-left-element, pattern at both ends)
    import org.apache.spark.unsafe.types.UTF8String
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    def foldReplica(toks: Seq[String], a: String, b: String): Seq[String] =
      toks.foldLeft(Vector.empty[String]) { (acc, x) =>
        if (acc.nonEmpty && acc.last == a && x == b) acc.init :+ (a + b)
        else acc :+ x
      }
    def computePass(toks: Seq[String], a: String, b: String): Seq[String] = {
      val arr = new GenericArrayData(toks.map(UTF8String.fromString).toArray[AnyRef])
      val m = BpeTrainer.mergePairCompute(arr,
        UTF8String.fromString(a), UTF8String.fromString(b))
      (0 until m.numElements()).map(m.getUTF8String(_).toString)
    }
    val rng = new scala.util.Random(42)
    val alphabet = Seq("a", "b", "ab", "ba", "aa")
    val cases = Seq(
      (Seq("a", "a", "a"), "a", "a"),
      (Seq("a", "b", "a", "b"), "a", "b"),
      (Seq("ab", "b", "b"), "ab", "b"),
      (Seq("b", "a"), "a", "b")) ++
      (1 to 200).map { _ =>
        val toks = Seq.fill(1 + rng.nextInt(12))(alphabet(rng.nextInt(alphabet.size)))
        val a = alphabet(rng.nextInt(alphabet.size))
        val b = alphabet(rng.nextInt(alphabet.size))
        (toks, a, b)
      }
    cases.foreach { case (toks, a, b) =>
      assert(foldReplica(toks, a, b) === computePass(toks, a, b),
        s"fold diverged on toks=$toks merge=($a,$b)")
    }
  }

  test("registered BPE queries: merges match the reference; encode totals are consistent") {
    import org.apache.spark.sql.functions._
    val sf = TestSpark.Sf
    val wc = BpeTrainer.wordCounts(
      graft.sources.Tables.documents(spark, sf).select("doc_id", "text"))
    val ref = referenceTrain(
      wc.collect().map(r => r.getString(0) -> r.getLong(1)).toSeq, 12)
    val merges = TextOps.bpeMerges(spark, sf).collect()
      .map(r => Merge(r.getLong(0).toInt, r.getString(1), r.getString(2), r.getLong(3)))
    assert(merges.toSeq === ref)
    // encode totals: Σ n_occ·len(token) == Σ word chars (tokens
    // partition every word), and Σ over single-char tokens decreases
    val enc = TextOps.bpeEncode(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1))
    val charTotal = wc.select(sum(length(col("word")) * col("n")))
      .collect()(0).getLong(0)
    assert(enc.map { case (t, n) => t.length.toLong * n }.sum === charTotal)
    assert(enc.exists(_._1.length > 1), "training must actually produce multi-char tokens")
  }

  test("doc-token budgets are consistent with the corpus encode totals") {
    import org.apache.spark.sql.functions._
    val sf = TestSpark.Sf
    val perDoc = TextOps.bpeDocTokens(spark, sf)
      .agg(sum(col("n_tokens")), sum(col("n_words"))).collect()(0)
    val encodeTotal = TextOps.bpeEncode(spark, sf)
      .agg(sum(col("n_occ"))).collect()(0).getLong(0)
    // every word occurrence tokenizes identically at type altitude, so
    // Σ per-doc tokens == Σ per-token corpus totals
    assert(perDoc.getLong(0) === encodeTotal)
    val wsWords = graft.sources.Tables.documents(spark, sf)
      .filter(length(col("text")) > 0)
      .select(explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) > 0).count()
    assert(perDoc.getLong(1) === wsWords)
    // fertility sanity: merges compress, so tokens < chars and ≥ words
    val rows = TextOps.bpeDocTokens(spark, sf).collect()
    rows.foreach(r => assert(r.getLong(1) >= r.getLong(2),
      s"doc ${r.getLong(0)}: fewer tokens than words"))
  }

  test("encoding round-trips: token concatenation reproduces the word") {
    val (got, _) = trainOn(Seq("tokenization tokenizer tokens token"), 8)
    Seq("tokenization", "tokenizer", "untokenized").foreach { w =>
      val toks = BpeTrainer.encodeWord(w, got)
      assert(toks.mkString === w)
      assert(toks.size <= w.length)
    }
    assert(BpeTrainer.encodeWord("abc", Nil) === Seq("a", "b", "c"))
  }
}
